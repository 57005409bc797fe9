from . import reducers, structure  # noqa: F401
