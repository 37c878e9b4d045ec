from gordo_components_spark.streaming.micro_batch import (  # noqa: F401
    run_streaming_scoring,
    run_streaming_tumbling_agg,
    run_streaming_watermark_dedup,
)
