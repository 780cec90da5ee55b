"""Relational & spatial operators built from native DataFrame primitives."""

from cosmap_spark.operators.cone_search import cone_search  # noqa: F401
from cosmap_spark.operators.sampler import uniform_sphere_samples  # noqa: F401
