from . import json, memory, parquet, text  # noqa: F401
