from . import strings, textstats  # noqa: F401
