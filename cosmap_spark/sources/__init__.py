"""Input connectors (SURVEY.md §2.2 "Scans / sources / sinks")."""

from cosmap_spark.sources.datasets import (  # noqa: F401
    list_datasets,
    open_dataset,
    register_dataset,
    resolve_dataset,
    unregister_dataset,
)
from cosmap_spark.sources.readers import (  # noqa: F401
    ingest_catalog,
    read_catalog_source,
    read_hdf5_directory,
)
