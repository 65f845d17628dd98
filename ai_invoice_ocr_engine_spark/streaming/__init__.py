from .incremental import incremental_extract, incremental_pdf_ingest
from .windows import (
    closed_sessions_batch,
    stateful_sessions,
    windowed_event_stats,
)

__all__ = [
    "incremental_extract",
    "incremental_pdf_ingest",
    "windowed_event_stats",
    "stateful_sessions",
    "closed_sessions_batch",
]
