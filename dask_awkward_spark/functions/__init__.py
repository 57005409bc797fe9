from . import graph, sketches, strings, textstats, timeseries  # noqa: F401
