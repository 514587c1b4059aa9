"""granule_catalog DataSource: pushdown-to-server, paged parallel read,
retry on 5xx, and 401 token refresh — against a local fixture HTTP
server (no network leaves the box)."""

from __future__ import annotations

import json
import os
import sys
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bloomy_etl_spark.sources.catalog import (  # noqa: E402
    GranuleCatalogDataSource,
    TokenProvider,
)

# ---------------------------------------------------------------------------
# fixture catalog: 40 granules, varied datetime / cloud / day_night
# ---------------------------------------------------------------------------
GRANULES = [
    {
        "granule_id": f"G{i:03d}",
        "datetime": f"2024-01-{(i % 28) + 1:02d}T10:00:00Z",
        "cloud_cover": float((i * 7) % 100),
        "day_night": "day" if i % 3 else "night",
        "bbox": [-50.0 + i, -10.0, -49.0 + i, -9.0],
        "download_urls": [f"https://data.example/G{i:03d}/B0{b}.tif"
                          for b in (2, 4, 8)],
    }
    for i in range(40)
]


class _State:
    def __init__(self):
        self.token_serial = 0
        self.token_calls = 0
        self.valid_tokens: set[str] = set()  # all unexpired tokens
        self.expire_current_token = False  # revoke issued tokens once
        self.fail_next = 0                 # next N data requests 500
        self.rate_limit_next = 0           # next N data requests 429
        self.rate_limit_header = "0.05"    # Retry-After value (None=omit)
        self.rate_limited_served = 0
        self.requests: list[dict] = []     # query params per data request
        self.granules = list(GRANULES)     # live (mutable) catalog
        self.snapshot_mode = False         # count returns a snapshot id
        self.snapshots: dict[str, list] = {}
        # inserted once, immediately after a /granules/count call:
        self.add_front: list = []          # worst case — shifts every page
        self.add_back: list = []           # benign — only extends the tail
        self.lock = threading.Lock()


def _match(g: dict, qp: dict) -> bool:
    if "cloud_cover_max" in qp and g["cloud_cover"] > float(qp["cloud_cover_max"]):
        return False
    if "aoi_bbox" in qp:  # bbox intersection: w,s,e,n
        w, s, e, n = (float(x) for x in qp["aoi_bbox"].split(","))
        gw, gs, ge, gn = g["bbox"]
        if ge < w or gw > e or gn < s or gs > n:
            return False
    if "temporal_start" in qp and g["datetime"] < qp["temporal_start"]:
        return False
    if "temporal_end" in qp and g["datetime"] > qp["temporal_end"]:
        return False
    if "day_night" in qp and g["day_night"] != qp["day_night"]:
        return False
    return True


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _send(self, code: int, body: dict, headers: dict | None = None):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            qp = {k: v[0] for k, v in
                  urllib.parse.parse_qs(parsed.query).items()}
            with state.lock:
                if parsed.path == "/token":
                    state.token_serial += 1
                    state.token_calls += 1
                    tok = f"tok-{state.token_serial}"
                    state.valid_tokens.add(tok)
                    self._send(200, {"token": tok, "expires_in": 3600})
                    return
                # data endpoints: auth + failure injection. Every
                # unexpired token is accepted (like a real auth server —
                # concurrent tasks legitimately hold different tokens);
                # the expiry injection revokes all issued tokens ONCE.
                if state.expire_current_token:
                    state.expire_current_token = False
                    state.valid_tokens.clear()
                    self._send(401, {"error": "token expired"})
                    return
                auth = self.headers.get("Authorization", "")
                if not (auth.startswith("Bearer ")
                        and auth[7:] in state.valid_tokens):
                    self._send(401, {"error": "bad token"})
                    return
                if state.fail_next > 0:
                    state.fail_next -= 1
                    self._send(503, {"error": "try later"})
                    return
                if state.rate_limit_next > 0:
                    state.rate_limit_next -= 1
                    state.rate_limited_served += 1
                    hdr = (
                        {"Retry-After": state.rate_limit_header}
                        if state.rate_limit_header is not None else {}
                    )
                    self._send(429, {"error": "slow down"}, hdr)
                    return
                state.requests.append(dict(qp))
                # page reads carrying a snapshot id see that frozen
                # version; everything else sees the live catalog
                src = state.granules
                if "snapshot" in qp and qp["snapshot"] in state.snapshots:
                    src = state.snapshots[qp["snapshot"]]
                hits = [g for g in src if _match(g, qp)]
                if parsed.path == "/granules/count":
                    body = {"total": len(hits)}
                    if state.snapshot_mode:
                        sid = f"snap-{len(state.snapshots)}"
                        state.snapshots[sid] = list(state.granules)
                        body["snapshot"] = sid
                    if state.add_front or state.add_back:
                        state.granules = (
                            state.add_front + state.granules + state.add_back
                        )
                        state.add_front, state.add_back = [], []
                    self._send(200, body)
                elif parsed.path == "/granules":
                    page = int(qp.get("page", "0"))
                    size = int(qp.get("page_size", "1000"))
                    self._send(200, {"granules":
                                     hits[page * size:(page + 1) * size]})
                else:
                    self._send(404, {"error": "nope"})

    return Handler


@pytest.fixture()
def server():
    state = _State()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


@pytest.fixture()
def catalog(spark, server):
    endpoint, state = server
    spark.dataSource.register(GranuleCatalogDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (spark.read.format("granule_catalog")
          .option("endpoint", endpoint)
          .option("page_size", "8")
          .load())
    return df, state


class TestPushdown:
    def test_filters_reach_the_server(self, catalog):
        df, state = catalog
        out = (df.filter("cloud_cover <= 20")
                 .filter("day_night = 'day'")
                 .filter("datetime >= '2024-01-05'")).collect()
        want = [g for g in GRANULES
                if g["cloud_cover"] <= 20 and g["day_night"] == "day"
                and g["datetime"] >= "2024-01-05"]
        assert {r["granule_id"] for r in out} == \
            {g["granule_id"] for g in want}
        # the predicates arrived at the SOURCE as query params
        assert state.requests, "no data requests recorded"
        for qp in state.requests:
            assert float(qp.get("cloud_cover_max")) == 20.0
            assert qp.get("day_night") == "day"
            assert qp.get("temporal_start") == "2024-01-05"

    def test_strict_less_than_is_pushed_superset_and_refiltered(self, catalog):
        df, state = catalog
        out = df.filter("cloud_cover < 7").collect()
        want = [g for g in GRANULES if g["cloud_cover"] < 7]
        assert {r["granule_id"] for r in out} == \
            {g["granule_id"] for g in want}
        # pushed as inclusive max (superset) — Spark re-applies '<'
        assert all(float(qp.get("cloud_cover_max")) == 7.0
                   for qp in state.requests)

    def test_between_pushes_both_bounds(self, catalog):
        """A BETWEEN-style datetime range (two conjuncts) must push BOTH
        bounds to the server as temporal_start AND temporal_end."""
        df, state = catalog
        out = df.filter(
            "datetime >= '2024-01-05' AND datetime <= '2024-01-20T23:59:59Z'"
        ).collect()
        want = [g for g in GRANULES
                if "2024-01-05" <= g["datetime"] <= "2024-01-20T23:59:59Z"]
        assert {r["granule_id"] for r in out} == \
            {g["granule_id"] for g in want}
        assert state.requests, "no data requests recorded"
        for qp in state.requests:
            assert qp.get("temporal_start") == "2024-01-05"
            assert qp.get("temporal_end") == "2024-01-20T23:59:59Z"

    def test_spatial_aoi_pushes_bbox(self, catalog):
        """A bbox-intersection AOI predicate (bound comparisons on the
        four bbox columns) must reach the server as one aoi_bbox query
        param, with Spark re-applying the exact predicate."""
        df, state = catalog
        out = df.filter(
            "east >= -40 AND west <= -30 AND north >= -9.5 AND south <= -9"
        ).collect()
        want = [g for g in GRANULES
                if g["bbox"][2] >= -40 and g["bbox"][0] <= -30
                and g["bbox"][3] >= -9.5 and g["bbox"][1] <= -9]
        assert want, "fixture AOI selects nothing — bad test bounds"
        assert {r["granule_id"] for r in out} == \
            {g["granule_id"] for g in want}
        assert state.requests, "no data requests recorded"
        for qp in state.requests:
            assert qp.get("aoi_bbox") == "-40.0,-9.5,-30.0,-9.0"

    def test_unfiltered_scan_pages_in_parallel(self, catalog):
        df, state = catalog
        rows = df.collect()
        assert len(rows) == len(GRANULES)
        pages = {qp.get("page") for qp in state.requests
                 if qp.get("page") is not None}
        assert len(pages) == 5  # ceil(40 / 8) partitions, one fetch each


class TestResilience:
    def test_retry_on_5xx(self, catalog):
        df, state = catalog
        state.fail_next = 2
        rows = df.filter("day_night = 'night'").collect()
        want = [g for g in GRANULES if g["day_night"] == "night"]
        assert len(rows) == len(want)

    def test_401_forces_token_refresh(self, catalog):
        df, state = catalog
        state.expire_current_token = True
        rows = df.collect()
        assert len(rows) == len(GRANULES)
        assert state.token_serial >= 2  # a refresh happened

    def test_429_honors_retry_after_and_recovers(self, catalog):
        df, state = catalog
        state.rate_limit_next = 2
        rows = df.collect()
        assert len(rows) == len(GRANULES)
        assert state.rate_limited_served == 2  # both 429s were retried

    def test_429_without_header_uses_backoff(self, catalog):
        df, state = catalog
        state.rate_limit_next = 1
        state.rate_limit_header = None  # no Retry-After → exponential
        rows = df.collect()
        assert len(rows) == len(GRANULES)
        assert state.rate_limited_served == 1


class TestPageConsistency:
    def test_snapshot_pins_page_boundaries(self, catalog):
        """Granules inserted between /granules/count and the page reads
        (at the FRONT of the listing, the worst case: every page
        boundary shifts) must cause neither duplicates nor misses when
        the server issues a snapshot id — the reader echoes it on every
        page, so all pages serve one frozen catalog version."""
        df, state = catalog
        state.snapshot_mode = True
        intruders = [
            {
                "granule_id": f"NEW{i}",
                "datetime": "2024-01-01T00:00:00Z",
                "cloud_cover": 0.0,
                "day_night": "day",
                "bbox": [0.0, 0.0, 1.0, 1.0],
                "download_urls": [],
            }
            for i in range(12)
        ]
        state.add_front = list(intruders)
        got = [r["granule_id"] for r in df.collect()]
        # exactly the snapshot set: no NEW* rows, no dupes, no misses
        assert sorted(got) == sorted(g["granule_id"] for g in GRANULES)
        assert len(got) == len(set(got))

    def test_snapshotless_server_tail_appends_are_benign(self, catalog):
        """Tolerate-and-document path: on a server with NO snapshot
        support, END-of-listing appends never duplicate or drop the
        rows that existed at count time (their page boundaries are
        unchanged); front-inserts CAN shift pages on such a server —
        that residual is documented in partitions()."""
        df, state = catalog
        state.add_back = [{
            "granule_id": f"TAIL{i}",
            "datetime": "2024-02-01T00:00:00Z",
            "cloud_cover": 0.0,
            "day_night": "day",
            "bbox": [0.0, 0.0, 1.0, 1.0],
            "download_urls": [],
        } for i in range(5)]
        got = [r["granule_id"] for r in df.collect()]
        original = [g["granule_id"] for g in GRANULES]
        # every count-time row exactly once, in order; the appended tail
        # may or may not surface (page count was fixed at count time)
        assert [g for g in got if not g.startswith("TAIL")] == original
        assert len(got) == len(set(got))


class TestTokenProvider:
    def test_refresh_margin(self, server):
        endpoint, state = server
        tp = TokenProvider(endpoint, refresh_margin_s=10_000)  # always stale
        assert tp.should_refresh()
        tp.login()
        first = state.token_serial
        assert tp.should_refresh()  # margin exceeds expiry window
        tp.refresh_if_needed()
        assert state.token_serial == first + 1
        tp2 = TokenProvider(endpoint, refresh_margin_s=1)
        tp2.login()
        assert not tp2.should_refresh()
        with pytest.raises(RuntimeError):
            TokenProvider(endpoint).get_headers()
