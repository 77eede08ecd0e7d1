from picovdb_spark.streaming.dedup import (
    content_digest,
    stream_exact_dedup,
    stream_simhash_mark,
)
from picovdb_spark.streaming.ingest import stream_upsert
from picovdb_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sessionized_stream,
    windowed_event_agg,
)

__all__ = [
    "content_digest",
    "stream_exact_dedup",
    "stream_simhash_mark",
    "stream_upsert",
    "read_events_stream",
    "run_to_memory",
    "sessionized_stream",
    "windowed_event_agg",
]
