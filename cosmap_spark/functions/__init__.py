"""Scalar/column function library (JVM-side expressions, no Python UDFs)."""

from cosmap_spark.functions.spherical import (  # noqa: F401
    SEP_DEG_SQL,
    angular_sep_deg,
    ra_delta_deg,
    zone_of_dec,
)
