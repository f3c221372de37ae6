"""Loopback-server coverage for the real-network fetch transport
(stages/http_fetch.py; reference web_crawler/utils/download.py:4-18).

A stdlib ThreadingHTTPServer on 127.0.0.1 plays the web: robots.txt with a
Disallow, an index page linking deeper, a page behind robots, a blacklisted
.pdf. The tests pin (1) the HTML→span extractor, (2) the batch fetch
contract (same appended columns/types as the store fetch, 404-on-error,
https→http fallback, wall-clock same-host politeness), and (3) the full
wave loop + CLI over ``--transport http``.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pyarrow as pa
import pytest

# pages padded past the reference's 256-byte should_scrape floor
# (worker.py:53-71) so links actually extract
_PAD = "<p>" + " ".join(f"filler word number {i}" for i in range(24)) + "</p>"

PAGES = {
    "/robots.txt": (
        "text/plain",
        "User-agent: *\nDisallow: /private\n",
    ),
    "/": (
        "text/html",
        "<html><head><title>Loop Home</title></head><body>"
        "<h1>welcome crawler</h1><p>intro text body paragraph here</p>"
        '<a href="/a">page a</a> <a href="/private/x">secret</a>'
        f'<img src="/logo.png" alt="logo art">{_PAD}'
        "</body></html>",
    ),
    "/a": (
        "text/html",
        "<html><head><title>Page A</title></head><body>"
        'more body words <a href="/b">page b</a> <a href="/file.pdf">doc</a>'
        f"<script>var x=1;</script>{_PAD}"
        "</body></html>",
    ),
    "/b": (
        "text/html",
        "<html><body>terminal page content "
        f'<a href="/">home</a>{_PAD}</body></html>',
    ),
    "/private/x": ("text/html", f"<html><body>never fetched{_PAD}</body></html>"),
    "/file.pdf": ("application/pdf", "%PDF-fake"),
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 - stdlib API name
        page = PAGES.get(self.path)
        if page is None:
            self.send_response(404)
            self.end_headers()
            return
        ctype, body = page
        data = body.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def loopback():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    host = f"127.0.0.1:{srv.server_port}"
    try:
        yield host
    finally:
        srv.shutdown()


def test_parse_spans_shapes():
    from web_crawler_search_engine_ray.stages.http_fetch import parse_spans

    spans = parse_spans(PAGES["/"][1])
    kinds = [(s["kind"], s["text"], s["media_ref"]) for s in spans]
    assert ("title", "Loop Home", "") in kinds
    assert ("h1", "welcome crawler", "") in kinds
    assert ("link", "page a", "/a") in kinds
    assert ("link", "secret", "/private/x") in kinds
    assert ("image", "logo art", "/logo.png") in kinds
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    # script bodies keep their kind (profiles drop them downstream)
    sa = parse_spans(PAGES["/a"][1])
    assert ("script", "var x=1;", "") in [
        (s["kind"], s["text"], s["media_ref"]) for s in sa
    ]


def test_fetch_batch_contract(loopback):
    """Same appended columns/types as the store fetch; https→http fallback
    (normalize coerces to https, the loopback origin is plain http);
    miss → 404/empty; same-host politeness enforced in wall time."""
    from web_crawler_search_engine_ray.stages.http_fetch import make_http_fetch_fn

    urls = [
        f"https://{loopback}/",
        f"https://{loopback}/a",
        f"https://{loopback}/nope",
        f"https://{loopback}/file.pdf",
    ]
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array([loopback] * len(urls), pa.string()),
        }
    )
    pol = 0.3
    fetch = make_http_fetch_fn(timeout=5.0, politeness=pol)
    t0 = time.time()
    out = fetch(batch)
    elapsed = time.time() - t0
    assert out.column("status").type == pa.int32()
    assert out.column("content_bytes").type == pa.int64()
    assert out.column("is_html").type == pa.bool_()
    assert out.column("spans").type == pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    assert out.column("status").to_pylist() == [200, 200, 404, 200]
    assert out.column("is_html").to_pylist() == [True, True, False, False]
    assert out.column("content_bytes").to_pylist()[2] == 0
    spans0 = out.column("spans")[0].as_py()
    assert any(s["kind"] == "link" and s["media_ref"] == "/a" for s in spans0)
    assert out.column("spans")[3].as_py() == []  # pdf: no span parse
    # 4 same-host fetches => at least 3 politeness gaps of wall time
    assert elapsed >= 3 * pol


def test_run_crawl_http_transport(ray_session, loopback, tmp_path):
    """Full wave loop over the network adapter: robots fetched per host by
    the shards (Disallow honored), links followed to exhaustion, blacklisted
    extension pruned, pages/lineage sinks written."""
    from web_crawler_search_engine_ray.pipelines.crawl import run_crawl
    from web_crawler_search_engine_ray.sources.synthetic_web import CrawlConfig

    cfg = CrawlConfig(root_domains=(loopback,), politeness=0.05)
    out = run_crawl(
        docs_path=None,
        robots_bodies={},
        seed_urls=[f"http://{loopback}/"],
        config=cfg,
        workdir=str(tmp_path / "crawl"),
        fetch_transport="http",
        http_options={"timeout": 5.0, "politeness": 0.05},
    )
    lin = out.lineage().to_pandas().sort_values("seq")
    fetched = lin["url"].tolist()
    assert fetched == [
        f"https://{loopback}",
        f"https://{loopback}/a",
        f"https://{loopback}/b",
    ]
    assert (lin["status"] == 200).all()
    # robots Disallow and the .pdf blacklist both kept URLs out
    assert not any("/private" in u or ".pdf" in u for u in fetched)
    seen = {r["url"]: r for r in out.seen().to_pylist()}
    # robots-blocked: marked complete in the ledger (reference
    # mark_url_complete semantics, frontier.py:148-152) but NEVER fetched —
    # absent from lineage, zero length
    blocked = seen[f"https://{loopback}/private/x"]
    assert blocked["downloaded"] and blocked["length"] == 0
    assert f"https://{loopback}/file.pdf" not in seen  # invalid, never queued


def test_cli_crawl_transport_http(ray_session, loopback, tmp_path, capsys):
    from web_crawler_search_engine_ray.__main__ import main

    rc = main(
        [
            "crawl",
            "--transport",
            "http",
            "--seeds",
            f"http://{loopback}/",
            "--root-domains",
            loopback,
            "--politeness",
            "0.05",
            "--workdir",
            str(tmp_path / "cli_crawl"),
        ]
    )
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["pages_fetched"] == 3 and rec["waves"] >= 1

    # store mode without --web-dir is a usage error, not a crash
    assert main(["crawl", "--workdir", str(tmp_path / "x")]) == 2
