from .windows import sessionized_counts, stream_tumbling_counts  # noqa: F401
