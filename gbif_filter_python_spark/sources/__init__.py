"""Sources and sinks (SURVEY.md §2 ops 1-3)."""

from gbif_filter_python_spark.sources.io import (
    read_taxa_csv,
    read_corpus,
    write_csv,
)

__all__ = ["read_taxa_csv", "read_corpus", "write_csv"]
