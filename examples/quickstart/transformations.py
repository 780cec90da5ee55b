"""Quickstart transformations — the reference README tutorial
(reference README.md:55-74) reshaped as DataFrame expressions.

Each ``Main`` static method is one node of the analysis DAG
(transformations.json).  Inputs arrive by name: ``needed-data`` tables
(the cone join already provides ``sep_deg`` per (sample, object) pair),
upstream results via the ``dependencies`` aliases, and config values via
``needed-parameters``.
"""

from pyspark.sql import functions as F


class Main:
    @staticmethod
    def compute_radius(catalog):
        """Angular separation in arcsec (reference compute_radius,
        README.md:60-66 — ``center.separation(coords).to(u.arcsec)``)."""
        return catalog.withColumn("sep_arcsec", F.col("sep_deg") * 3600.0)

    @staticmethod
    def compute_result(with_radius, min_radius):
        """Drop near-center objects, then per-sample count + summed
        distance (reference compute_result, README.md:68-74)."""
        far = with_radius.where(F.col("sep_deg") > min_radius)
        return far.groupBy("sample_id").agg(
            F.count("*").alias("n_objects"),
            F.round(F.sum("sep_arcsec"), 4).alias("total_arcsec"),
        )
