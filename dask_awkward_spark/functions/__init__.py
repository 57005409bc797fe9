from . import graph, hist, sketches, strings, textstats, timeseries  # noqa: F401
