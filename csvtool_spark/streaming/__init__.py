from csvtool_spark.streaming.events import (  # noqa: F401
    deduped_stream,
    enriched_stream,
    event_stream,
    interval_join_streams,
    run_to_memory,
    sessionized_stream,
    windowed_agg_stream,
)
from csvtool_spark.streaming.documents import (  # noqa: F401
    curated_stream,
    document_stream,
    piped_stream,
    quality_gated_stream,
    sampled_stream,
    stream_documents_dir,
    streaming_vocab,
)
