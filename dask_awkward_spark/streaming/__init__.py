from .windows import (  # noqa: F401
    sessionized_counts,
    stream_dedup_counts,
    stream_static_enrich,
    stream_tumbling_counts,
)
