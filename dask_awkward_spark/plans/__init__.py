from .inspect import explain_str, necessary_columns, pushed_filters  # noqa: F401
