"""The cosmap-style declarative pipeline engine, Spark-first.

The reference's compute model: a JSON "transformation block" names a DAG
of user Python functions; the engine validates it, topo-sorts it, and
runs it per sample (reference src/cosmap/analysis/dependencies.py,
task.py).  Here the same declarative spec compiles to ONE lazy DataFrame
plan: native transformations compose Spark ops directly; black-box
per-sample functions become ``applyInPandas`` over sample_id groups.
Catalyst fuses the chain — the reference's "fusion" was running the topo
list in one Python process.
"""

from cosmap_spark.pipeline.dag import build_dag, topo_order  # noqa: F401
from cosmap_spark.pipeline.errors import (  # noqa: F401
    BadSampleError,
    CosmapSparkError,
    DagCycleError,
    DagValidationError,
)
from cosmap_spark.pipeline.pipeline import compile_pipeline  # noqa: F401
