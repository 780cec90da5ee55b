"""Input connectors (SURVEY.md §2.2 "Scans / sources / sinks")."""

from cosmap_spark.sources.readers import (  # noqa: F401
    ingest_catalog,
    read_catalog_source,
    read_hdf5_directory,
)
