"""Pushdown-capable Spark DataSource for GBIF occurrence search —
the DataSourceV2-style live source SURVEY §7.3 deferred and VERDICT
r6 listed as the one remaining optional gap.

The reference's online occurrence probe is a serial loop: one
``occurrences.search(taxonKey=…, country=…, limit=…)`` HTTPS call per
taxon (/root/reference/gbif_helper.py:86-88). This module turns that
endpoint into a first-class Spark table via the Python DataSource API
(pyspark >= 4.1):

* **Filter pushdown** (``pushFilters``): equality/IN predicates on
  ``taxon_key`` and equality on ``country`` are consumed by the
  source and become REST query parameters — a
  ``df.filter(col("taxon_key").isin(...))`` plans as N taxon-keyed
  API fetches instead of a full scan + Spark-side filter. Range
  predicates on ``decimal_latitude`` / ``decimal_longitude`` fold
  into a WKT envelope on the REST ``geometry`` parameter (the same
  parameter the reference pushes its config polygon through,
  /root/reference/gbif_helper.py:87): closed bounds (>=, <=) are
  consumed outright, strict bounds (>, <) fold the closed superset
  envelope but remain residual so Spark enforces strictness exactly.
  Everything else is returned as residual for Spark to evaluate.
* **Partition-per-taxon** (``partitions``): each pushed taxon key
  becomes one input partition, so fetches parallelize across
  executor Python workers exactly as far as the key list allows —
  with per-worker throttling inherited from
  :class:`~.gbif_rest.GbifRestClient`.
* **No unbounded scans**: GBIF occurrence search is a paged API over
  billions of records; a read with neither a ``taxon_keys`` option
  nor a pushed taxon predicate raises instead of silently attempting
  a full crawl (the same loud-scope contract as the multimodal
  codecs).

Transports are injected by IMPORT PATH because DataSource options
are strings: ``fetch_factory="module:callable"`` resolves to a
factory that receives the JSON-decoded ``fetch_args`` option and
returns the fetch callable. The default factory builds a
:class:`GbifRestClient`; :func:`scripted_occurrence_fetch` is the
hermetic twin the test suite uses (no network anywhere in tests —
the sources/gbif_rest.py contract).

Usage::

    spark.dataSource.register(GbifOccurrencesDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (spark.read.format("gbif_occurrences")
          .option("limit_per_taxon", "300").load()
          .filter(F.col("taxon_key").isin(2476674, 5231190))
          .filter(F.col("country") == "FR"))
"""

from __future__ import annotations

import json
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

#: Output schema — the occurrence fields the reference's pipeline
#: consumes (taxonKey/country/coordinates/name; gbif_helper.py:86-99).
SCHEMA = (
    "taxon_key bigint, occurrence_key bigint, scientific_name string, "
    "country string, decimal_latitude double, decimal_longitude double"
)

_FIELDS = (
    "taxon_key",
    "occurrence_key",
    "scientific_name",
    "country",
    "decimal_latitude",
    "decimal_longitude",
)


def _resolve_factory(spec: str):
    """``"module.path:attr"`` → the imported attribute."""
    mod, _, attr = spec.partition(":")
    if not mod or not attr:
        raise ValueError(
            f"fetch_factory must be 'module.path:callable', got {spec!r}"
        )
    import importlib

    return getattr(importlib.import_module(mod), attr)


def rest_occurrence_fetch(args: dict):
    """Default factory: a :class:`~.gbif_rest.GbifRestClient`-backed
    fetch. ``args`` forwards to the client constructor (base_url,
    min_interval_s, …)."""
    from gbif_filter_python_spark.sources.gbif_rest import GbifRestClient

    client = GbifRestClient(**(args or {}))

    def fetch(
        taxon_key: int,
        country: str | None,
        geometry: str | None,
        limit: int,
    ) -> list[dict]:
        recs = client.occurrence_search_all(
            taxon_key=taxon_key,
            country=country,
            geometry=geometry,
            max_records=limit,
        )
        return recs

    return fetch


class ScriptedOccurrenceFetch:
    """Hermetic fetch for tests: ``data`` maps
    ``"<taxonKey>|<country or ''>|<geometry or ''>"`` to a list of
    occurrence dicts. Optionally appends one JSON line per call to
    ``call_log`` so a test can assert WHICH parameters reached the
    source (the observable proof that pushdown fired — worker
    processes can't mutate test-process globals). Picklable by
    construction: plain dict + path."""

    def __init__(self, data: dict, call_log: str | None = None) -> None:
        self.data = data
        self.call_log = call_log

    def __call__(
        self,
        taxon_key: int,
        country: str | None,
        geometry: str | None,
        limit: int,
    ) -> list[dict]:
        if self.call_log:
            with open(self.call_log, "a") as fh:
                fh.write(
                    json.dumps(
                        {
                            "taxon_key": taxon_key,
                            "country": country,
                            "geometry": geometry,
                            "limit": limit,
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )
        key = f"{taxon_key}|{country or ''}|{geometry or ''}"
        return self.data.get(key, [])[:limit]


def scripted_occurrence_fetch(args: dict):
    """Factory for :class:`ScriptedOccurrenceFetch` (args:
    ``{"data": {...}, "call_log": "/path"}``)."""
    return ScriptedOccurrenceFetch(
        args.get("data", {}), args.get("call_log")
    )


#: Range-pushdown axes: attribute path -> (axis, index-into-bounds).
_RANGE_ATTRS = {
    ("decimal_latitude",): "lat",
    ("decimal_longitude",): "lon",
}

#: WGS84 coordinate domain per axis — folded bounds are clamped to
#: this before WKT rendering, and bounds wholly outside it prove the
#: scan empty (see ``_bbox_empty``).
_AXIS_DOMAIN = {"lat": (-90.0, 90.0), "lon": (-180.0, 180.0)}


def _fmt_deg(v: float) -> str:
    """Deterministic decimal-degree text for WKT (no exponent, no
    trailing zeros): 6 dp ≈ 0.11 m, beyond GBIF coordinate precision."""
    s = f"{float(v):.6f}".rstrip("0").rstrip(".")
    return s if s not in ("", "-0") else "0"


def bbox_wkt(
    lat_lo: float | None,
    lat_hi: float | None,
    lon_lo: float | None,
    lon_hi: float | None,
) -> str:
    """Counter-clockwise WKT envelope (lon lat vertex order) for the
    GBIF ``geometry`` search parameter — the same parameter the
    reference pushes its config polygon through
    (/root/reference/gbif_helper.py:87). Open sides default to the
    full coordinate domain."""
    lat_lo = -90.0 if lat_lo is None else lat_lo
    lat_hi = 90.0 if lat_hi is None else lat_hi
    lon_lo = -180.0 if lon_lo is None else lon_lo
    lon_hi = 180.0 if lon_hi is None else lon_hi
    pts = [
        (lon_lo, lat_lo),
        (lon_hi, lat_lo),
        (lon_hi, lat_hi),
        (lon_lo, lat_hi),
        (lon_lo, lat_lo),
    ]
    ring = ",".join(f"{_fmt_deg(x)} {_fmt_deg(y)}" for x, y in pts)
    return f"POLYGON(({ring}))"


class GbifOccurrencesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.options = dict(options)
        keys_opt = self.options.get("taxon_keys", "")
        self.keys: list[int] | None = (
            [int(k) for k in keys_opt.split(",") if k.strip()]
            if keys_opt.strip()
            else None
        )
        self.country: str | None = self.options.get("country")
        self.geometry: str | None = self.options.get("geometry")
        self.limit = int(self.options.get("limit_per_taxon", "1000"))
        # closed bbox bounds accumulated from pushed range filters:
        # {"lat": [lo, hi], "lon": [lo, hi]}, None = unconstrained side
        self.bounds: dict[str, list[float | None]] = {
            "lat": [None, None],
            "lon": [None, None],
        }
        self._bbox_pushed = False

    # -- pushdown -------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("country",)
                and self.country is None
                and isinstance(f.value, str)
            ):
                self.country = f.value
            elif isinstance(f, EqualTo) and f.attribute == ("taxon_key",):
                k = int(f.value)
                self.keys = (
                    [k]
                    if self.keys is None
                    else [x for x in self.keys if x == k]
                )
            elif isinstance(f, In) and f.attribute == ("taxon_key",):
                vals = [int(v) for v in f.value]
                self.keys = (
                    vals
                    if self.keys is None
                    else [x for x in self.keys if x in set(vals)]
                )
            elif (
                isinstance(
                    f,
                    (GreaterThan, GreaterThanOrEqual,
                     LessThan, LessThanOrEqual),
                )
                and f.attribute in _RANGE_ATTRS
                and self.geometry is None  # explicit WKT option wins —
                # intersecting arbitrary polygons source-side is out of
                # scope, so range filters stay fully Spark-side then
                and isinstance(f.value, (int, float))
                and not isinstance(f.value, bool)
                and float(f.value) == float(f.value)  # NaN: never fold
                # (NaN passes isinstance, defeats the lo>hi emptiness
                # test, and would render literally as 'nan' in WKT)
            ):
                # fold the bound into the REST geometry envelope —
                # the reference's geometry pushdown
                # (/root/reference/gbif_helper.py:87) generalized to
                # planner-derived bboxes. The envelope is a PREFILTER
                # only: every folded bound is ALSO yielded back as
                # residual, so Spark re-verifies each row post-scan.
                # Rationale (ADVICE r8): the real GBIF geometry API has
                # boundary/winding/antimeridian semantics of its own —
                # treating a REST-side polygon as exact would make any
                # divergence a silent wrong answer, while a residual
                # re-check makes it at worst a missed pruning. The
                # envelope therefore only ever REDUCES transferred
                # rows; correctness never depends on it.
                axis = _RANGE_ATTRS[f.attribute]
                v = float(f.value)
                lo, hi = self.bounds[axis]
                if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self.bounds[axis][0] = v if lo is None else max(lo, v)
                else:
                    self.bounds[axis][1] = v if hi is None else min(hi, v)
                self._bbox_pushed = True
                yield f  # always residual — envelope is best-effort
            else:
                yield f  # residual — Spark evaluates it post-scan

    def _bbox_empty(self) -> bool:
        """True when the folded bounds imply a provably empty result:
        lo > hi on an axis, or a bound entirely outside the coordinate
        domain (lat >= 100 can match nothing — answer empty locally
        rather than sending an invalid polygon GBIF rejects with 400).
        Sound even though bounds stay residual: the same closed bounds
        Spark would re-check are unsatisfiable."""
        for axis, (dom_lo, dom_hi) in _AXIS_DOMAIN.items():
            lo, hi = self.bounds[axis]
            if lo is not None and hi is not None and lo > hi:
                return True
            if lo is not None and lo > dom_hi:
                return True
            if hi is not None and hi < dom_lo:
                return True
        return False

    def _effective_geometries(self) -> list[str | None]:
        """REST ``geometry`` prefilters (each element = one fetch
        call), or ``[None]`` when no sound envelope exists. Bounds are
        clamped to the WGS84 domain before rendering (a half-open
        lat >= -100 must not put -100 in the WKT). A single ring is
        emitted only when the clamped longitude width is <= 180
        degrees: the GBIF geometry API requires anticlockwise
        single-hemisphere-ish rings and mishandles full-width /
        antimeridian-edge polygons, and a >180-degree ring is
        winding-ambiguous. A WIDER span is split at its longitude
        midpoint into TWO <=180-degree rings (GBIF accepts repeated
        geometry params — one request each) so a lat-only or wide-lon
        pushdown keeps its REST-side transfer reduction instead of
        withholding the envelope entirely (ADVICE r9; the r9 behavior
        transferred every row in the lat band). Rows on the shared
        meridian can come back from BOTH rings — ``read`` dedupes.
        Always safe: every bound is residual (Spark re-checks), so
        the envelope only ever reduces transfer."""
        if self.geometry is not None:
            return [self.geometry]
        if not self._bbox_pushed:
            return [None]
        clamped: dict[str, list[float | None]] = {}
        for axis, (dom_lo, dom_hi) in _AXIS_DOMAIN.items():
            lo, hi = self.bounds[axis]
            clamped[axis] = [
                None if lo is None else max(lo, dom_lo),
                None if hi is None else min(hi, dom_hi),
            ]
        lat_lo, lat_hi = clamped["lat"]
        lon_lo = -180.0 if clamped["lon"][0] is None else clamped["lon"][0]
        lon_hi = 180.0 if clamped["lon"][1] is None else clamped["lon"][1]
        if lon_hi - lon_lo > 180.0:
            mid = (lon_lo + lon_hi) / 2.0  # each half <= 180 degrees
            return [
                bbox_wkt(lat_lo, lat_hi, lon_lo, mid),
                bbox_wkt(lat_lo, lat_hi, mid, lon_hi),
            ]
        return [
            bbox_wkt(lat_lo, lat_hi, clamped["lon"][0], clamped["lon"][1])
        ]

    # -- planning -------------------------------------------------------
    def partitions(self) -> list[InputPartition]:
        if self.keys is None:
            raise ValueError(
                "gbif_occurrences is an unbounded paged API: provide a "
                "taxon_keys option or an equality/IN filter on "
                "taxon_key (pushdown requires "
                "spark.sql.python.filterPushdown.enabled=true)"
            )
        # keys == [] is NOT unconstrained: it's an empty pushdown
        # intersection (e.g. option keys 1,2 filtered to key 3) and
        # the correct answer is an empty scan, not an error. Spark
        # still calls read() once when the partition list is empty,
        # so emit one explicit empty-sentinel partition. A degenerate
        # pushed bbox (lo > hi on either axis) is the same case.
        if not self.keys or self._bbox_empty():
            return [InputPartition(None)]
        # one partition per taxon: fetches parallelize across workers,
        # each worker throttled independently (gbif_rest contract)
        return [InputPartition(int(k)) for k in sorted(set(self.keys))]

    # -- execution ------------------------------------------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        if partition is None or partition.value is None:
            return  # empty-intersection sentinel: zero rows
        spec = self.options.get(
            "fetch_factory",
            "gbif_filter_python_spark.sources.occurrence_source:"
            "rest_occurrence_fetch",
        )
        args = json.loads(self.options.get("fetch_args", "{}"))
        fetch = _resolve_factory(spec)(args)
        geoms = self._effective_geometries()
        if len(geoms) == 1:
            for rec in fetch(
                partition.value, self.country, geoms[0], self.limit
            ):
                yield tuple(rec.get(f) for f in _FIELDS)
            return
        # split-ring envelope: a record exactly on the shared meridian
        # may be returned by both rings — dedupe by occurrence_key
        # (GBIF's unique record id) when the transport provides one,
        # else by the full projected tuple (in which case two distinct
        # keyless records with identical projections conflate — they
        # are indistinguishable downstream anyway, but the single-ring
        # path would keep both; documented contract). limit_per_taxon
        # stays a PER-TAXON cap across both calls; the seen-set is
        # bounded by that same limit.
        seen: set = set()
        for geom in geoms:
            for rec in fetch(partition.value, self.country, geom, self.limit):
                row = tuple(rec.get(f) for f in _FIELDS)
                occ_key = rec.get("occurrence_key")
                key = ("k", occ_key) if occ_key is not None else ("t", row)
                if key in seen:
                    continue
                seen.add(key)
                yield row
                if len(seen) >= self.limit:
                    return


class GbifOccurrencesDataSource(DataSource):
    """``spark.read.format("gbif_occurrences")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "gbif_occurrences"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> GbifOccurrencesReader:
        return GbifOccurrencesReader(self.options)
