"""Output connectors (reference O24/O25)."""

from cosmap_spark.sinks.writers import (  # noqa: F401
    append_csv,
    multi_output,
    write_output,
)
