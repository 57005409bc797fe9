"""Behavior registry — record-class methods/properties dispatched by name.

Spark-native re-expression of the reference's behavior mechanism
(lib/core.py:1654-1684 ``Array.__getattr__`` dispatch via
``_BehaviorMethodFn``/``_BehaviorPropertyFn`` :2741-2755, and the
``dask_property``/``dask_method`` decorators :150-353). Records are tagged
with ``with_name``; attribute lookup on a tagged NestedArray falls through
to the registered class, whose members receive the array and return
Column-expression results — so behaviors stay in the native tier, not UDFs.

Example::

    @register_behavior("Point")
    class PointBehavior:
        @behavior_property
        def r2(arr):
            return arr["x"] * arr["x"] + arr["y"] * arr["y"]

        def scale(arr, k):
            return st.zip({"x": arr["x"] * k, "y": arr["y"] * k})

    pts = with_name(points, "Point")
    pts.r2          # property: NestedArray of x²+y²
    pts.scale(2.0)  # method
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, type] = {}


def register_behavior(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        _REGISTRY[name] = cls
        return cls

    return deco


def behavior_property(fn: Callable) -> "_BehaviorProperty":
    return _BehaviorProperty(fn)


class _BehaviorProperty:
    def __init__(self, fn: Callable):
        self.fn = fn


def lookup_behavior(name: str | None, attr: str) -> Any | None:
    if name is None or name not in _REGISTRY:
        return None
    return getattr(_REGISTRY[name], attr, None)


def behavior_members(name: str | None) -> dict:
    """Public members of the behavior class registered under ``name``
    (the dict the reference exposes as ``daa.behavior``)."""
    if name is None or name not in _REGISTRY:
        return {}
    cls = _REGISTRY[name]
    return {k: v for k, v in vars(cls).items() if not k.startswith("_")}


# Reference decorator names (lib/core.py:150-353): ``dask_property`` marks a
# property on a behavior class; ``dask_method`` marks a method. Plain methods
# already dispatch through lookup_behavior, so dask_method is the identity.
dask_property = behavior_property


def dask_method(fn: Callable) -> Callable:
    return fn
