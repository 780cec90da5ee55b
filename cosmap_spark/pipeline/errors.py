"""Engine error taxonomy (reference src/cosmap/analysis/errors.py:1-11)."""

from __future__ import annotations


class CosmapSparkError(Exception):
    """Base class for engine errors."""


class DagValidationError(CosmapSparkError):
    """Spec ↔ implementation mismatch or malformed transformation block
    (reference rejects these at src/cosmap/analysis/analysis.py:114-126,
    src/cosmap/analysis/task.py:104-107)."""


class DagCycleError(DagValidationError):
    """The transformation graph has a cycle (reference
    src/cosmap/analysis/dependencies.py:60-62)."""


class BadSampleError(CosmapSparkError):
    """Raised by a user transformation to drop the current sample
    (reference CosmapBadSampleError, src/cosmap/analysis/errors.py:1-11;
    handled at task.py:155-157).  In the Spark engine, per-sample UDFs
    that raise this yield null rows which are filtered out."""
