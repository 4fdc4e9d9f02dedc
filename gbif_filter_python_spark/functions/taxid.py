"""TaxId column functions (SURVEY.md §2 ops 31-33).

The legacy value type is ``DBPREFIX:ID`` (e.g. ``GBIF:2433670``) with
split-on-colon parsing and a two-token validity check
(/root/reference/util/__pycache__/taxid.cpython-37.pyc:
``init_from_string`` errors "... is not a valid taxid. Expected format
is DBPREFIX:ID."), and ``is_valid_taxid`` checks the prefix is GBIF
(/root/reference/util/__pycache__/gbif.cpython-37.pyc). All pure
Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_taxid(col: Column) -> Column:
    """``"GBIF:2433670"`` → struct(type='GBIF', value='2433670');
    null when the value is not exactly two ':'-separated tokens."""
    parts = F.split(col, ":")
    return F.when(
        F.size(parts) == 2,
        F.struct(parts[0].alias("type"), parts[1].alias("value")),
    )


def is_valid_taxid(col: Column, prefix: str = "GBIF") -> Column:
    """Prefix test + numeric id test (strengthens the legacy check,
    which only looked at the prefix)."""
    parts = F.split(col, ":")
    return (
        (F.size(parts) == 2)
        & (parts[0] == prefix)
        # try_cast: ANSI mode (Spark 4 default) throws on malformed ids
        & parts[1].try_cast("long").isNotNull()
    )


def format_taxid(prefix: Column | str, id_col: Column) -> Column:
    """Inverse of parse: build ``PREFIX:ID`` strings (legacy __str__)."""
    p = F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.concat_ws(":", p, id_col.cast("string"))
