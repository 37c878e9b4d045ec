from gordo_components_spark.plans.pipeline_compiler import (  # noqa: F401
    from_definition,
    into_definition,
)
from gordo_components_spark.plans.model_registry import (  # noqa: F401
    ModelRegistry,
    calculate_model_key,
)
