from .windows import session_stats, sliding_counts, tumbling_counts
from .pipeline import (
    dedup_within_watermark,
    run_to_memory_sink,
    stream_events,
    with_watermark,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_stats",
    "stream_events",
    "with_watermark",
    "dedup_within_watermark",
    "run_to_memory_sink",
]
