from .windows import (
    enrich_with_dim,
    session_stats,
    sliding_counts,
    tumbling_counts,
    windowed_topk_to_parquet,
)
from .pipeline import (
    baseline_histogram,
    dedup_within_watermark,
    foreach_batch_drift,
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
    "enrich_with_dim",
    "windowed_topk_to_parquet",
    "baseline_histogram",
    "foreach_batch_drift",
]
