"""gbif_filter_python_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ``nleguillarme/gbif-filter-python``
(see /root/reference, studied in SURVEY.md). Where the reference drives
one blocking HTTPS round-trip per input row
(/root/reference/apply_gbif_filter.py:114), this engine expresses the
same semantics as declarative DataFrame plans that Catalyst optimizes:
projection → dedup → dimension join → spatial semi-join → hierarchical
expansion → collect_list aggregation → tag/filter → sink.

Public API (mirrors the reference's legacy ``OccurrenceEngine`` facade,
util/__pycache__/occurrence_engine.cpython-37.pyc, but set-oriented:
every verb takes and returns DataFrames).
"""

from gbif_filter_python_spark.config import FilterConfig, Zone, Country, Polygon
from gbif_filter_python_spark.engine import OccurrenceEngine

__version__ = "0.1.0"

__all__ = [
    "FilterConfig",
    "Zone",
    "Country",
    "Polygon",
    "OccurrenceEngine",
]
