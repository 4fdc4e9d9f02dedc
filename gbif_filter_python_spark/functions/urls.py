"""URL canonicalization for web-corpus deduplication.

Beyond-reference operator (SURVEY.md §2 final row): the first dedup
pass every web-scale training pipeline runs is *canonical-URL* dedup —
the same page crawled as ``HTTP://WWW.Example.COM:80/a/?utm_source=x``
and ``http://example.com/a`` must collapse to one key before any
content-level (MinHash/SimHash) pass sees it. Canonicalization is a
pure Column expression — JVM-side, inside whole-stage codegen, no
Python in the loop — so the pass is map-only at 100 TB: canonicalize,
hash-groupBy on the canonical key, keep-best. No reference counterpart
(`/root/reference/` has no web/document surface).

Rules applied (the conservative, widely-agreed subset — semantics-
preserving for any well-behaved server):

1. strip the fragment (``#...`` is client-side only);
2. lowercase the scheme and host (DNS is case-insensitive; the path
   is NOT lowered — path case is significant);
3. drop the default port (``:80`` for http, ``:443`` for https);
4. drop a leading ``www.`` host label;
5. collapse trailing slashes on the path; empty path becomes ``/``;
6. drop known tracking query parameters (``utm_*``, ``fbclid``,
   ``gclid``, ``ref``) and sort the survivors so parameter order
   cannot defeat the dedup key.

Every rule is mirrored literally by the DuckDB oracle twin in
``__spark_entry__.oracle_sql()["url_canonical_dedup"]``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url"]

#: Query-parameter prefixes dropped as tracking noise. LIKE patterns —
#: shared verbatim with the SQL twin.
TRACKING_PARAM_PATTERNS: tuple[str, ...] = (
    "utm_%",
    "fbclid=%",
    "gclid=%",
    "ref=%",
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (rules in module doc).

    Pure Column expression; non-URL junk degrades gracefully (no
    scheme/host extracted -> the trimmed input round-trips through the
    path rules) rather than erroring, because a crawl manifest always
    contains a few malformed rows.
    """
    # 1. fragment off first: everything after it is client-side.
    u = F.regexp_replace(F.trim(url), "#.*$", "")
    # Split base / query string.
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.regexp_extract(u, r"\?(.*)$", 1)

    # 2. scheme + host lowered; path case preserved.
    scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/]+)", 1)
    )
    path = F.regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")

    # 3. default ports; 4. leading www.
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"^www\.", "")

    # 5. trailing-slash collapse; empty -> '/'.
    cpath = F.regexp_replace(path, "/+$", "")
    cpath = F.when(cpath == "", F.lit("/")).otherwise(cpath)

    # 6. tracking params out, survivors sorted.
    params = F.split(query, "&")
    kept = F.filter(
        params,
        lambda p: (p != "")
        & ~p.like(TRACKING_PARAM_PATTERNS[0])
        & ~p.like(TRACKING_PARAM_PATTERNS[1])
        & ~p.like(TRACKING_PARAM_PATTERNS[2])
        & ~p.like(TRACKING_PARAM_PATTERNS[3]),
    )
    cquery = F.concat_ws("&", F.array_sort(kept))

    canon = F.concat(scheme, F.lit("://"), host, cpath)
    return F.when(
        cquery == "", canon
    ).otherwise(F.concat(canon, F.lit("?"), cquery))
