from gordo_components_spark.functions.filter_dsl import compile_filter  # noqa: F401
