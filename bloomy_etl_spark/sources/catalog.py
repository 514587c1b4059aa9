"""Remote granule-catalog source: a Spark 4 Python ``DataSource`` over
an HTTP catalog endpoint, with pushed predicates, paged parallel reads,
retry, and token refresh-on-expiry.

This is the executable counterpart to the reference's live
catalog/auth/download stack (``core/searcher.py:14-47`` — temporal /
polygon / cloud-cover / day-night query pushed to the remote API;
``core/authenticator.py:14-43`` — bearer token with expiry tracking and
refresh margin; ``core/processor.py:96-163`` — per-granule retry around
fetches). No proprietary endpoint is assumed: the wire format is plain
JSON over HTTP with explicit query parameters, and tests run against a
local fixture server.

Why a DataSource and not a driver-side requests loop: the catalog query
belongs in the PLAN. Expressed this way,

* ``df.filter(cloud_cover <= 20)`` reaches the SERVER as a query
  parameter (``pushFilters`` → fewer granules ever cross the wire);
* pages become input partitions, so a 10M-granule catalog listing is
  fetched by the cluster in parallel, not by the driver;
* retry/backoff and 401-refresh happen per task, where the fetch runs.

Usage::

    spark.dataSource.register(GranuleCatalogDataSource)
    df = (spark.read.format("granule_catalog")
          .option("endpoint", "http://catalog.example/api")
          .option("page_size", "500")
          .load()
          .filter("cloud_cover <= 20 AND day_night = 'day'")
          .filter("datetime >= '2024-01-01' AND datetime < '2024-02-01'"))

Requires ``spark.sql.python.filterPushdown.enabled=true`` for the
predicates to reach the source (Spark 4.1 gate); without it the source
still works, filtering post-scan.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterable, Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["GranuleCatalogDataSource", "TokenProvider"]

SCHEMA = StructType(
    [
        StructField("granule_id", StringType()),
        StructField("datetime", StringType()),  # ISO-8601 UTC
        StructField("cloud_cover", DoubleType()),
        StructField("day_night", StringType()),
        StructField("west", DoubleType()),
        StructField("south", DoubleType()),
        StructField("east", DoubleType()),
        StructField("north", DoubleType()),
        StructField("download_urls", ArrayType(StringType())),
    ]
)


class TokenProvider:
    """Bearer-token lifecycle: fetch, expiry tracking, refresh margin.

    Models the reference authenticator's refresh-on-expiry behavior
    (``core/authenticator.py:27-35``): a token is considered stale
    ``refresh_margin_s`` BEFORE its announced expiry, so long fetches
    never start with a token about to lapse. Tokens come from
    ``{endpoint}/token`` as ``{"token": ..., "expires_in": seconds}``.

    Use :meth:`shared` on executors: it hands out one provider per
    (endpoint, python worker process), so a thousand read tasks on a
    reused worker share one login instead of hammering the token
    endpoint once per task.
    """

    _SHARED: dict[str, "TokenProvider"] = {}

    @classmethod
    def shared(cls, endpoint: str,
               refresh_margin_s: float = 60.0) -> "TokenProvider":
        key = endpoint.rstrip("/")
        prov = cls._SHARED.get(key)
        if prov is None:
            prov = cls._SHARED[key] = cls(key, refresh_margin_s)
        return prov

    def __init__(self, endpoint: str, refresh_margin_s: float = 60.0):
        self.endpoint = endpoint.rstrip("/")
        self.refresh_margin_s = refresh_margin_s
        self._token: str | None = None
        self._expiry: float | None = None

    def login(self) -> None:
        req = urllib.request.Request(f"{self.endpoint}/token")
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = json.loads(resp.read().decode("utf-8"))
        self._token = body["token"]
        self._expiry = time.monotonic() + float(body.get("expires_in", 3600))

    def should_refresh(self) -> bool:
        if self._expiry is None:
            return True
        return time.monotonic() >= (self._expiry - self.refresh_margin_s)

    def refresh_if_needed(self) -> None:
        if self.should_refresh():
            self.login()

    def force_refresh(self) -> None:
        """A 401 from the server overrides local expiry bookkeeping."""
        self.login()

    def get_headers(self) -> dict[str, str]:
        if self._token is None:
            raise RuntimeError("unauthenticated: call login() first")
        return {"Authorization": f"Bearer {self._token}"}


@dataclass
class _Page(InputPartition):
    page: int
    # server-issued snapshot id (from /granules/count), echoed on every
    # page read so all pages see ONE consistent catalog version
    snapshot: str | None = None


def _http_json(url: str, headers: dict[str, str], timeout: float) -> Any:
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


class _CatalogReader(DataSourceReader):
    # pushable predicate -> query parameter mapping (the reference's
    # searcher pushes exactly temporal/cloud_cover/day_night this way)
    def __init__(self, options: dict[str, str]):
        if "endpoint" not in options:
            raise ValueError("granule_catalog requires option 'endpoint'")
        self.endpoint = options["endpoint"].rstrip("/")
        self.page_size = int(options.get("page_size", "1000"))
        self.max_retries = int(options.get("max_retries", "3"))
        self.retry_backoff_s = float(options.get("retry_backoff_s", "0.05"))
        # 429 handling honors the server's Retry-After up to this cap —
        # a hostile/misconfigured header must not park an executor task
        # for minutes; past the cap the server's pacing intent is kept
        # (we still wait the cap, longer than the exponential default).
        self.retry_after_cap_s = float(options.get("retry_after_cap_s", "2"))
        self.timeout_s = float(options.get("timeout_s", "30"))
        self.params: dict[str, str] = {}
        self._aoi: dict[str, float] = {}  # filter-derived bbox edges
        if "bbox" in options:  # explicit AOI option: "west,south,east,north"
            self.params["bbox"] = options["bbox"]

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        # Pushdown here is a bandwidth OPTIMIZATION, never a semantic
        # contract: every filter — pushed or not — is returned to Spark
        # for post-scan re-evaluation. That makes the push trivially
        # safe under every composition Spark can hand us: duplicate
        # same-attribute predicates (cloud_cover <= 10 AND <= 20),
        # contradictions (day_night = 'day' AND = 'night' → the server
        # returns one side's superset, Spark re-applies both → 0 rows),
        # and strict bounds pushed as inclusive supersets. For bounds we
        # push the STRONGEST value seen (min upper / max lower) so the
        # server prunes maximally; for equality, any one conjunct is a
        # valid superset filter. Eager (NOT a generator): the param side
        # effects must happen during planning even if Spark lazily
        # consumes the result.
        def _tighten(key: str, value, keep) -> None:
            old = self.params.get(key)
            if old is None:
                self.params[key] = str(value)
            else:  # compare in the value's own type (float / ISO string)
                self.params[key] = str(keep(type(value)(old), value))

        for f in filters:
            attr = f.attribute[0] if f.attribute else None
            if attr == "cloud_cover" and isinstance(
                f, (LessThan, LessThanOrEqual)
            ):
                _tighten("cloud_cover_max", f.value, min)
            elif attr == "datetime" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual)
            ):
                _tighten("temporal_start", f.value, max)
            elif attr == "datetime" and isinstance(
                f, (LessThan, LessThanOrEqual)
            ):
                _tighten("temporal_end", f.value, min)
            elif attr == "day_night" and isinstance(f, EqualTo):
                self.params.setdefault("day_night", str(f.value))
            # Spatial AOI: the standard bbox-intersection predicate is
            #   east >= aoi_w AND west <= aoi_e AND
            #   north >= aoi_s AND south <= aoi_n
            # Each conjunct maps to one edge of a server-side bbox
            # query param (the reference searcher pushes its polygon
            # the same way). Pushed as a SUPERSET (strict bounds become
            # inclusive); Spark re-applies the exact predicate.
            elif attr == "east" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual)
            ):
                self._aoi["w"] = max(self._aoi.get("w", -180.0),
                                     float(f.value))
            elif attr == "west" and isinstance(
                f, (LessThan, LessThanOrEqual)
            ):
                self._aoi["e"] = min(self._aoi.get("e", 180.0),
                                     float(f.value))
            elif attr == "north" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual)
            ):
                self._aoi["s"] = max(self._aoi.get("s", -90.0),
                                     float(f.value))
            elif attr == "south" and isinstance(
                f, (LessThan, LessThanOrEqual)
            ):
                self._aoi["n"] = min(self._aoi.get("n", 90.0),
                                     float(f.value))
        if self._aoi and "bbox" not in self.params:
            # an explicit bbox option wins; filter-derived edges default
            # to the full globe on the unconstrained sides
            self.params["aoi_bbox"] = ",".join(
                str(self._aoi.get(k, d))
                for k, d in (("w", -180.0), ("s", -90.0),
                             ("e", 180.0), ("n", 90.0))
            )
        return list(filters)

    def _fetch(self, path: str, params: dict[str, str],
               token: TokenProvider) -> Any:
        """GET with bounded retry (5xx / connection errors / 429 rate
        limits) and one forced token refresh on 401 per attempt loop —
        the ``core/processor.py:96-163`` retry discipline. A 429's
        ``Retry-After`` (seconds form) is honored up to
        ``retry_after_cap_s``; the HTTP-date form and a missing header
        fall back to the exponential backoff."""
        qs = urllib.parse.urlencode(params)
        url = f"{self.endpoint}{path}?{qs}" if qs else f"{self.endpoint}{path}"
        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            token.refresh_if_needed()
            delay = self.retry_backoff_s * (2 ** attempt)
            try:
                return _http_json(url, token.get_headers(), self.timeout_s)
            except urllib.error.HTTPError as e:
                last = e
                if e.code == 401:
                    token.force_refresh()  # expiry raced us; retry fresh
                elif e.code == 429:
                    try:
                        ra = float(e.headers.get("Retry-After"))
                    except (TypeError, ValueError):
                        ra = None
                    if ra is not None and ra >= 0:
                        delay = min(ra, self.retry_after_cap_s)
                elif not (500 <= e.code < 600):
                    raise  # 4xx other than auth/rate-limit: not retryable
            except urllib.error.URLError as e:
                last = e
            if attempt < self.max_retries:  # no pointless terminal sleep
                time.sleep(delay)
        raise RuntimeError(
            f"catalog fetch failed after {self.max_retries + 1} attempts: "
            f"{url}"
        ) from last

    def partitions(self) -> list[InputPartition]:
        # Page-boundary consistency: granules added/removed between the
        # count call and the page reads would shift page boundaries and
        # duplicate or drop rows. Servers that version their listings
        # return a ``snapshot`` id with the count; we echo it on every
        # page read, so all pages serve one consistent catalog version.
        # Servers WITHOUT snapshots get tolerate-and-document semantics:
        # the read reflects the catalog as paged (rows present for the
        # whole read are never dropped or duplicated WITHIN a page, but
        # concurrent inserts may shift later pages) — re-run the query
        # for a fresh view, exactly like listing any mutable remote.
        token = TokenProvider.shared(self.endpoint)
        params = dict(self.params)
        params["page_size"] = str(self.page_size)
        meta = self._fetch("/granules/count", params, token)
        total = int(meta["total"])
        snapshot = meta.get("snapshot")
        n_pages = max(1, -(-total // self.page_size))
        return [_Page(p, snapshot) for p in range(n_pages)]

    def read(self, partition: _Page) -> Iterator[tuple]:
        token = TokenProvider.shared(self.endpoint)
        params = dict(self.params)
        params["page"] = str(partition.page)
        params["page_size"] = str(self.page_size)
        if partition.snapshot is not None:
            params["snapshot"] = str(partition.snapshot)
        body = self._fetch("/granules", params, token)
        for g in body["granules"]:
            bbox = g.get("bbox", [None, None, None, None])
            yield (
                g["granule_id"],
                g["datetime"],
                float(g["cloud_cover"]),
                g.get("day_night"),
                bbox[0], bbox[1], bbox[2], bbox[3],
                list(g.get("download_urls", [])),
            )


class GranuleCatalogDataSource(DataSource):
    """``spark.read.format("granule_catalog")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "granule_catalog"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> _CatalogReader:
        return _CatalogReader(dict(self.options))
