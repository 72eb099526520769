"""Structured Streaming surface (beyond-reference: the reference has NO
streaming — one PDF, one batch CLI run; SURVEY.md §2.8). Incremental
corpus ingestion with byte-identical-to-batch correction, checkpointed
exactly-once sinks, stateful streaming dedup, and watermarked event-time
counters live in :mod:`llm_aided_ocr_spark.streaming.ingest`. Batch-side
resumability remains in plans.checkpoint; the streaming offsets log is
its incremental analogue."""

from llm_aided_ocr_spark.streaming.ingest import (  # noqa: F401
    correct_pages_stream,
    read_events_stream,
    read_pages_stream,
    streaming_dedup_by_key,
    windowed_event_counts,
    write_stream_parquet,
    write_stream_two_sinks,
)
