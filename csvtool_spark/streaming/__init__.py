from csvtool_spark.streaming.events import (  # noqa: F401
    deduped_stream,
    enriched_stream,
    event_stream,
    interval_join_streams,
    run_to_memory,
    sessionized_stream,
    windowed_agg_stream,
)
