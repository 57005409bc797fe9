from . import graph, strings, textstats  # noqa: F401
