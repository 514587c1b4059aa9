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
        self.requests: list[dict] = []     # query params per data request
        self.lock = threading.Lock()


def _match(g: dict, qp: dict) -> bool:
    if "cloud_cover_max" in qp and g["cloud_cover"] > float(qp["cloud_cover_max"]):
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

        def _send(self, code: int, body: dict):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
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
                state.requests.append(dict(qp))
                hits = [g for g in GRANULES if _match(g, qp)]
                if parsed.path == "/granules/count":
                    self._send(200, {"total": len(hits)})
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
