"""Typed query configuration — the engine's logical-plan parameters.

Replaces the reference's YAML→Box attr-dict plus ``validate_config``
(/root/reference/apply_gbif_filter.py:32-71) with an eagerly-validated
dataclass. Deliberate fixes over the reference (documented in
SURVEY.md §2 semantics notes):

* **Zone precedence (§2-E)**: the reference crashes on country-only
  configs (``cfg.geometry`` read unconditionally at
  apply_gbif_filter.py:140 but only assigned when country is absent at
  :43-44) and silently ANDs both when both are present, contradicting
  its own config comment (example/config.yml:8). Here ``zone`` is an
  explicit ``Country | Polygon`` union; if a config supplies both,
  country wins, honoring the documented intent.
* **Legacy configs fail loudly (§1.3)**: the legacy generation
  (``taxa_column``/``taxa_field``, test/config.yml:2-4) is detected and
  rejected with a migration hint instead of an attribute error.
"""

from __future__ import annotations

import dataclasses
import re
import warnings
from dataclasses import dataclass

from gbif_filter_python_spark.schemas import HABITATS, RANKS

try:  # pyyaml ships with many distros but is not a hard dependency
    import yaml

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False


class ConfigError(ValueError):
    """Raised on invalid or legacy-generation configuration."""


# --------------------------------------------------------------------------
# Zone union type (SURVEY.md §2 ops 16-17)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Country:
    """ISO-3166-1 alpha-2 country predicate (gbif_helper.py:87)."""

    code: str

    def __post_init__(self) -> None:
        if not re.fullmatch(r"[A-Za-z]{2}", self.code):
            raise ConfigError(
                f"country must be an ISO-3166-1 alpha-2 code, got {self.code!r}"
            )
        object.__setattr__(self, "code", self.code.upper())

    def label(self) -> str:
        return f"country {self.code}"


@dataclass(frozen=True)
class Polygon:
    """WKT POLYGON predicate (gbif_helper.py:87, example/config.yml:7).

    Parsed eagerly so invalid WKT fails at config time, not mid-job.
    Multi-ring polygons (outer ring + holes) are supported with
    even-odd semantics — beyond the reference, whose WKT goes verbatim
    to the GBIF API, but necessary for real GBIF polygons which often
    carry holes. Antimeridian crossing stays out of scope (the
    reference ignores it too — SURVEY.md §7.4).
    """

    wkt: str

    def __post_init__(self) -> None:
        self.rings()  # validate eagerly

    def rings(self) -> list[list[tuple[float, float]]]:
        """All rings (outer first, then holes) as (lon, lat) pairs."""
        m = re.fullmatch(
            r"\s*POLYGON\s*\((.+)\)\s*", self.wkt, flags=re.IGNORECASE | re.DOTALL
        )
        if not m:
            raise ConfigError(f"not a WKT POLYGON: {self.wkt[:80]!r}")
        ring_texts = re.findall(r"\(([^()]*)\)", m.group(1))
        if not ring_texts:
            raise ConfigError(f"WKT POLYGON has no rings: {self.wkt[:80]!r}")
        rings: list[list[tuple[float, float]]] = []
        for ring_text in ring_texts:
            pts: list[tuple[float, float]] = []
            for pair in ring_text.split(","):
                toks = pair.split()
                if len(toks) != 2:
                    raise ConfigError(f"bad WKT coordinate pair: {pair!r}")
                pts.append((float(toks[0]), float(toks[1])))
            if len(pts) < 4 or pts[0] != pts[-1]:
                raise ConfigError(
                    "each WKT polygon ring must be closed with >= 4 points"
                )
            rings.append(pts)
        return rings

    def ring(self) -> list[tuple[float, float]]:
        """The outer ring (kept for single-ring callers)."""
        return self.rings()[0]

    def bbox(self) -> tuple[float, float, float, float]:
        """(min_lon, min_lat, max_lon, max_lat) of the OUTER ring
        (holes lie inside it) — drives the pushdown-friendly range
        prefilter (SURVEY.md §4.3)."""
        ring = self.ring()
        lons = [p[0] for p in ring]
        lats = [p[1] for p in ring]
        return (min(lons), min(lats), max(lons), max(lats))

    def label(self) -> str:
        return "POLYGON"


Zone = Country | Polygon


def resolve_zone(country: str | None, geometry: str | None) -> Zone | None:
    """Country wins when both are given (fixes SURVEY.md §2-E)."""
    if country:
        return Country(country)
    if geometry:
        return Polygon(geometry)
    return None


# --------------------------------------------------------------------------
# Filter configuration (reference: apply_gbif_filter.py:40-71)
# --------------------------------------------------------------------------

_LEGACY_KEYS = {"taxa_column", "taxa_field"}


@dataclass
class FilterConfig:
    """All parameters of the GBIF-filter pipeline.

    Role-column binding is a query parameter, not a schema property
    (SURVEY.md §1.3): ``name_column``/``taxid_column``/``rank_column``
    name which input columns carry the taxon name / ID / rank, with
    scalar fallbacks ``taxa_rank`` / ``taxa_kingdom``
    (apply_gbif_filter.py:47-56).
    """

    name_column: str | None = None
    taxid_column: str | None = None
    rank_column: str | None = None
    taxa_rank: str | None = None
    taxa_kingdom: str | None = None
    zone: Zone | None = None
    resolve_to_rank: str | None = None  # None = no expansion
    habitat: str | None = None
    sep: str = ","

    def __post_init__(self) -> None:
        # Need at least one role column (apply_gbif_filter.py:56 raises a
        # bare Exception; we raise a typed, actionable error).
        if not self.name_column and not self.taxid_column:
            raise ConfigError(
                "need at least one of name_column or taxid_column"
            )
        if self.taxa_rank is not None:
            self.taxa_rank = self.taxa_rank.upper()
            if self.taxa_rank not in RANKS:
                raise ConfigError(
                    f"taxa_rank must be one of {RANKS}, got {self.taxa_rank!r}"
                )
        if self.resolve_to_rank is not None:
            # The reference normalizes to {SPECIES, GENUS}, defaulting to
            # SPECIES on any other value (apply_gbif_filter.py:59-64). We
            # keep the domain but reject instead of silently defaulting.
            self.resolve_to_rank = self.resolve_to_rank.upper()
            if self.resolve_to_rank not in ("SPECIES", "GENUS"):
                raise ConfigError(
                    "resolve_to_rank must be SPECIES or GENUS, got "
                    f"{self.resolve_to_rank!r}"
                )
        if self.habitat is not None:
            self.habitat = self.habitat.upper()
            if self.habitat not in HABITATS:
                raise ConfigError(
                    f"habitat must be one of {HABITATS}, got {self.habitat!r}"
                )

    @classmethod
    def from_dict(cls, raw: dict) -> "FilterConfig":
        """Build from a parsed YAML mapping (current generation only)."""
        if not isinstance(raw, dict):
            raise ConfigError(f"config root must be a mapping, got {type(raw)}")
        if _LEGACY_KEYS & raw.keys():
            raw = cls._migrate_legacy(raw)
        known = (
            {f.name for f in dataclasses.fields(cls)}
            | {"country", "geometry"}
            # engine-specific snapshot locations, read by the CLI layer
            | {"taxonomy_path", "occurrence_path"}
        )
        unknown = raw.keys() - known
        if unknown:
            raise ConfigError(f"unknown config keys: {sorted(unknown)}")
        zone = resolve_zone(raw.get("country"), raw.get("geometry"))
        dropped = ("country", "geometry", "taxonomy_path", "occurrence_path")
        kwargs = {k: v for k, v in raw.items() if k not in dropped}
        return cls(zone=zone, **kwargs)

    @classmethod
    def _migrate_legacy(cls, raw: dict) -> dict:
        """Map the previous-generation keys (``taxa_column`` +
        ``taxa_field``, /root/reference/test/config.yml:2-4) onto the
        current role-column keys with a deprecation warning, so an
        old config file runs unchanged: ``taxa_field: name`` binds
        ``taxa_column`` as ``name_column``; ``taxa_field: taxid``
        binds it as ``taxid_column``. (``taxa_rank`` is still a
        current key and needs no mapping.) The reference's own
        current code also no longer reads these keys — this shim is
        strictly friendlier than both."""
        raw = dict(raw)
        col = raw.pop("taxa_column", None)
        field = raw.pop("taxa_field", "name")
        if col is None:
            raise ConfigError(
                "legacy key taxa_field requires taxa_column; migrate to "
                "name_column/taxid_column/rank_column"
            )
        if field not in ("name", "taxid"):
            raise ConfigError(
                f"legacy taxa_field must be 'name' or 'taxid', got {field!r}"
            )
        target = "name_column" if field == "name" else "taxid_column"
        if raw.get(target) is not None:
            raise ConfigError(
                f"both legacy taxa_column and {target} are set; "
                "remove the legacy keys"
            )
        warnings.warn(
            f"legacy config keys taxa_column/taxa_field are deprecated; "
            f"use {target}: {col!r}",
            DeprecationWarning,
            stacklevel=3,
        )
        raw[target] = col
        return raw

    @classmethod
    def from_yaml(cls, path: str) -> "FilterConfig":
        """Parse a YAML config file (apply_gbif_filter.py:32-37)."""
        if not _HAVE_YAML:  # pragma: no cover
            raise ConfigError("pyyaml is not installed; use FilterConfig.from_dict")
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))
