"""Plugin hook system (reference O31).

The reference exposes three pluggy hooks — ``generate_tasks``,
``initialize_sampler``, ``generate_samples`` — all firstresult and
unique, requested by name (reference src/cosmap/plugins/manage.py:24-58,
specs src/cosmap/analysis/plugins.py:8-45, registry
src/cosmap/plugins/plugins.json:1-11).  Here the same contract is a
lightweight registry (no pluggy dependency): one implementation per hook
name, firstresult semantics, defaults provided by the engine.

Spark-relevant hooks:

* ``generate_samples(spark, sampling) -> DataFrame`` — replace the
  uniform sphere sampler (e.g. healpix-grid centers, an observed-fields
  table read from parquet).
* ``cone_strategy(catalog, samples, **kw) -> DataFrame`` — replace the
  spatial join (e.g. a survey with a prebuilt spatial index column).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from cosmap_spark.pipeline.errors import CosmapSparkError

#: hook name → single registered implementation (unique, like the
#: reference's ``unique=True`` hookspecs)
_HOOKS: dict[str, Callable] = {}

KNOWN_HOOKS = ("generate_samples", "cone_strategy", "generate_tasks")


def register(hook: str, fn: Callable | None = None, *, replace: bool = False):
    """Register an implementation (decorator or direct call)."""
    if hook not in KNOWN_HOOKS:
        raise CosmapSparkError(f"unknown hook {hook!r}; known: {KNOWN_HOOKS}")

    def _reg(f: Callable) -> Callable:
        if hook in _HOOKS and not replace:
            raise CosmapSparkError(f"hook {hook!r} already has an implementation")
        _HOOKS[hook] = f
        return f

    return _reg(fn) if fn is not None else _reg


def unregister(hook: str) -> None:
    _HOOKS.pop(hook, None)


def request(hook: str, default: Callable | None = None) -> Callable:
    """Fetch by name, falling back to the engine default (reference
    request-by-name, src/cosmap/plugins/manage.py:44-58)."""
    fn = _HOOKS.get(hook, default)
    if fn is None:
        raise CosmapSparkError(f"no implementation registered for hook {hook!r}")
    return fn


def call(hook: str, *args: Any, default: Callable | None = None, **kwargs: Any) -> Any:
    """Firstresult call: the single registered impl (or default) runs."""
    return request(hook, default)(*args, **kwargs)
