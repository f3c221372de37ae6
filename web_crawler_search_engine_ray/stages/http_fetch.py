"""Real-network fetch transport behind the store-fetch batch contract.

Rebuilds the reference's ``download()`` (web_crawler/utils/download.py:4-18
— ``requests.get(url, timeout=5)``, error/empty body → status 404) as a
``map_batches`` function with the SAME output contract as
``stages.fetch.make_fetch_fn``: the frontier batch comes back with
``status: int32, content_bytes: int64, is_html: bool,
spans: list<struct<kind,text,media_ref,offset>>`` appended, so the wave
loop (pipelines/crawl.py) is transport-agnostic — sinks, link extraction,
analytics and the seen ledger run unchanged. Gated OFF by default
(``run_crawl(fetch_transport="store")``); this sandbox has no outbound
network, so the executed coverage is the loopback ``http.server`` test
(tests/test_http_transport.py).

HTML → spans uses a stdlib ``html.parser`` extractor (BeautifulSoup is not
installed here): title/h1/h2/h3/strong/script/style/code text nodes, plain
text runs, anchor spans (kind='link', text=anchor text, media_ref=href)
and image spans (media_ref=src) — in document order with the span ``offset``
sequence, i.e. the same interleaved-document shape as the synthetic store
(schema.py DOCS_SCHEMA), so per-row span-sequence semantics are preserved.

https-first with http fallback: ``normalize()`` coerces http→https
(reference parity, utils/__init__.py:34-38), so a TLS-less origin — the
loopback test server, or any plain-http host — is retried over http when
the https connection errors.

Politeness: the wave scheduler spaces same-host URLs in VIRTUAL time
(stages/schedule.py); real-network mode must honor the floor in WALL time,
so same-host URLs within one batch fetch sequentially with ``politeness``
seconds between requests while distinct hosts fetch in parallel threads.
Robots over HTTP live in state/robots.py (``fetch_http=True`` shards fetch
``/robots.txt`` once per host inside the actor, default-allow on error —
create_robot's except path, frontier.py:80-82).
"""

from __future__ import annotations

import time
from html.parser import HTMLParser
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

from ..schema import SPAN_STRUCT

_KIND_TAGS = {"title", "h1", "h2", "h3", "strong", "script", "style", "code"}


class _SpanParser(HTMLParser):
    """HTML → ordered (kind, text, media_ref) span tuples."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: List[Tuple[str, str, str]] = []
        self._kinds: List[str] = ["text"]
        self._href: str = ""
        self._buf: List[str] = []

    def _flush(self) -> None:
        txt = " ".join("".join(self._buf).split())
        self._buf.clear()
        kind = self._kinds[-1]
        if kind == "link":
            # anchors emit at </a> so href + anchor text stay one span
            self.spans.append(("link", txt, self._href))
        elif txt:
            self.spans.append((kind, txt, ""))

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        if tag == "a":
            self._flush_text_only()
            self._href = a.get("href") or ""
            self._kinds.append("link")
        elif tag in _KIND_TAGS:
            self._flush_text_only()
            self._kinds.append(tag)
        elif tag == "img":
            self._flush_text_only()
            self.spans.append(("image", a.get("alt") or "", a.get("src") or ""))

    def _flush_text_only(self) -> None:
        # flush pending plain text before entering a tagged region; inside
        # an <a> the buffered text belongs to the link span, keep it
        if self._kinds[-1] != "link":
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and "link" in self._kinds:
            self._flush()
            self._kinds.remove("link")
            self._href = ""
        elif tag in _KIND_TAGS and tag in self._kinds:
            self._flush()
            self._kinds.remove(tag)

    def handle_data(self, data: str) -> None:
        self._buf.append(data)

    def finish(self) -> List[Tuple[str, str, str]]:
        self.close()
        if self._kinds[-1] != "link":
            self._flush()
        return self.spans


def parse_spans(html_text: str) -> List[dict]:
    p = _SpanParser()
    p.feed(html_text)
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(p.finish())
    ]


def fetch_robots_body(host: str, timeout: float = 5.0) -> Optional[str]:
    """GET {host}/robots.txt, https first then http; None on any failure
    (→ default-allow parser, the reference create_robot except path)."""
    import requests

    for scheme in ("https", "http"):
        try:
            resp = requests.get(f"{scheme}://{host}/robots.txt", timeout=timeout)
            if resp.status_code == 200 and resp.text:
                return resp.text
            if resp.status_code != 200:
                return None
        except requests.RequestException:
            continue
    return None


def _fetch_url(url: str, timeout: float) -> Tuple[int, int, bool, str]:
    """(status, content_bytes, is_html, html_text) — download.py semantics:
    exception or empty body → 404/empty; https→http retry on conn error."""
    import requests

    resp = None
    try:
        resp = requests.get(url, timeout=timeout)
    except requests.RequestException:
        if url.startswith("https://"):
            try:
                resp = requests.get("http://" + url[len("https://") :], timeout=timeout)
            except requests.RequestException:
                resp = None
    if resp is None:
        return 404, 0, False, ""
    content = resp.content or b""
    if not content:
        return 404, 0, False, ""
    ctype = resp.headers.get("Content-Type", "").lower()
    is_html = "text/html" in ctype or content.lstrip()[:1] == b"<"
    return int(resp.status_code), len(content), is_html, (resp.text if is_html else "")


def make_http_fetch_fn(
    timeout: float = 5.0, politeness: float = 0.5, max_threads: int = 8
):
    """Batch fetch over the real network; same contract as make_fetch_fn."""

    def fetch_batch(batch: pa.Table) -> pa.Table:
        from concurrent.futures import ThreadPoolExecutor

        urls = batch.column("url").to_pylist()
        hosts = batch.column("host").to_pylist()
        n = len(urls)
        results: List[Optional[tuple]] = [None] * n
        by_host: dict = {}
        for i, h in enumerate(hosts):
            by_host.setdefault(h, []).append(i)

        def run_host(idxs: List[int]) -> None:
            for j, i in enumerate(idxs):
                if j and politeness > 0:
                    time.sleep(politeness)  # real-time same-host floor
                results[i] = _fetch_url(urls[i], timeout)

        if by_host:
            with ThreadPoolExecutor(
                max_workers=max(1, min(max_threads, len(by_host)))
            ) as ex:
                list(ex.map(run_host, by_host.values()))

        status = np.fromiter((r[0] for r in results), np.int32, n)
        nbytes = np.fromiter((r[1] for r in results), np.int64, n)
        is_html = np.fromiter((r[2] for r in results), bool, n)
        spans = pa.array(
            [
                parse_spans(r[3]) if r[2] and r[3] else []
                for r in results
            ],
            pa.list_(SPAN_STRUCT),
        )
        out = batch
        for name, arr in (
            ("status", pa.array(status, pa.int32())),
            ("content_bytes", pa.array(nbytes, pa.int64())),
            ("is_html", pa.array(is_html, pa.bool_())),
            ("spans", spans),
        ):
            out = out.append_column(name, arr)
        return out

    return fetch_batch
