"""Transformation-block DAG: build, validate, topo-sort.

Reference semantics (src/cosmap/analysis/dependencies.py:19-64):
a block is ``{name: {"dependencies": {alias: node | [nodes]}, ...}}``;
every named dependency must exist; cycles are rejected; exactly one node
carries ``"is-output": true`` and it must be terminal (no other node may
depend on it — reference src/cosmap/analysis/task.py:104-107).

Hand-rolled Kahn's algorithm — no graph-library dependency; this runs
driver-side on specs of tens of nodes.
"""

from __future__ import annotations

from collections import deque

from cosmap_spark.pipeline.errors import DagCycleError, DagValidationError


def _dep_names(node_spec: dict) -> list[str]:
    deps = node_spec.get("dependencies", {}) or {}
    out: list[str] = []
    for v in deps.values():
        if isinstance(v, (list, tuple)):
            out.extend(v)
        else:
            out.append(v)
    return out


def build_dag(block: dict) -> dict[str, list[str]]:
    """Adjacency (node → its dependencies), with existence validation."""
    adj: dict[str, list[str]] = {}
    for name, spec in block.items():
        deps = _dep_names(spec)
        for d in deps:
            if d not in block:
                raise DagValidationError(
                    f"transformation {name!r} depends on unknown node {d!r}"
                )
        adj[name] = deps
    return adj


def output_node(block: dict) -> str:
    """The unique terminal ``is-output`` node."""
    outputs = [n for n, s in block.items() if s.get("is-output")]
    if len(outputs) != 1:
        raise DagValidationError(
            f"exactly one transformation must set 'is-output'; found {outputs!r}"
        )
    out = outputs[0]
    for name, spec in block.items():
        if name != out and out in _dep_names(spec):
            raise DagValidationError(
                f"output node {out!r} must be terminal but {name!r} depends on it"
            )
    return out


def topo_order(block: dict) -> list[str]:
    """Dependency-respecting execution order; raises on cycles."""
    adj = build_dag(block)
    indeg = {n: len(deps) for n, deps in adj.items()}
    dependents: dict[str, list[str]] = {n: [] for n in adj}
    for n, deps in adj.items():
        for d in deps:
            dependents[d].append(n)
    ready = deque(sorted(n for n, d in indeg.items() if d == 0))
    order: list[str] = []
    while ready:
        n = ready.popleft()
        order.append(n)
        for m in sorted(dependents[n]):
            indeg[m] -= 1
            if indeg[m] == 0:
                ready.append(m)
    if len(order) != len(adj):
        cyclic = sorted(n for n, d in indeg.items() if d > 0)
        raise DagCycleError(f"transformation graph has a cycle among {cyclic!r}")
    return order
