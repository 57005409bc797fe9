from . import datasource, json, memory, parquet, text  # noqa: F401
