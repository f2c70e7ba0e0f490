"""Structured Streaming pipeline (SURVEY.md §3.1-3.2, M3)."""

from .pipeline import (  # noqa: F401
    PipelineBatchResult,
    build_stage_rows,
    process_batch,
    read_landing_stream,
    run_batch,
    start_pipeline,
)
