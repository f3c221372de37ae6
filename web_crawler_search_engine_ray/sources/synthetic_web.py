"""Deterministic synthetic-web generator (the engine's "network").

Replaces live HTTP (reference ``download()``, web_crawler/utils/download.py)
with a seeded, reproducible Lance/Parquet ``docs`` table of interleaved
text+media documents:

    doc_id: string (canonical URL)
    spans:  list<struct<kind, text, media_ref, offset>>
    status / content_bytes / is_html: fetch metadata driving the
        should_scrape gates (worker.py:53-71) without a network.

The generator exercises every crawl edge case the reference handles:
relative/absolute/fragment/percent-encoded hrefs, bad schemes, external
domains, trap paths (duplicate segments, doku.php, blacklisted extensions),
banned query params, dead links (404), duplicate-content page pairs,
sub-256-byte pages, non-HTML pages, a robots-disallowed subtree, a host with
Crawl-delay above the politeness floor, and a deliberately hot host for skew
tests. Everything is a pure function of (seed, num_hosts, num_docs).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import DOCS_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA

ROOT_DOMAIN = "example.org"

_VOCAB = (
    "data stream crawl index search engine page link host queue token "
    "frontier batch arrow shard actor shuffle merge sort hash filter "
    "politeness robots delay fetch parse span text media image title "
    "ranking score vector cluster node block spill wave seed graph edge "
    "system memory store record column table query plan scan join group "
    "window limit union sample write read commit resume checkpoint state"
).split()


@dataclass
class CrawlConfig:
    """Mirror of the reference config (web_crawler/config.ini via
    utils/config.py) plus engine-only virtual-time knobs."""

    user_agent: str = "EngineBot"
    root_domains: tuple = (ROOT_DOMAIN,)
    politeness: float = 0.5          # POLITENESS, config.ini:13
    wave_span: float = 8.0           # virtual-time Δ per wave (§7.4)
    num_seen_shards: int = 8
    max_content_bytes: int = 10_000_000  # indexer 10MB skip (indexer/__init__.py:103)


def _page_words(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_VOCAB[i] for i in rng.randint(0, len(_VOCAB), n))


def generate_web(
    seed: int = 42,
    num_hosts: int = 5,
    num_docs: int = 50,
    hot_host_frac: float = 0.2,
    extra_links: int = 0,
    words_scale: int = 1,
) -> Dict[str, pa.Table]:
    """Build {docs, robots, seeds} tables deterministically.

    Host 0 receives ``hot_host_frac`` of all pages (skew); remaining pages
    follow a Zipf-ish split over the other hosts. Page 0 of host h links to
    page 0 of host (h+1) % H so the whole web is reachable from the seeds.
    """
    rng = np.random.RandomState(seed)
    hosts = [f"w{h}.{ROOT_DOMAIN}" for h in range(num_hosts)]

    # --- allocate pages to hosts (hot host + Zipf tail) ---
    weights = 1.0 / np.arange(1, num_hosts, dtype=np.float64) if num_hosts > 1 else np.array([])
    counts = np.zeros(num_hosts, dtype=np.int64)
    counts[0] = max(1, int(num_docs * hot_host_frac))
    if num_hosts > 1:
        rest = num_docs - counts[0]
        w = weights / weights.sum()
        counts[1:] = np.floor(rest * w).astype(np.int64)
        counts[1] += rest - counts[1:].sum()
    host_pages: List[List[str]] = []
    for h in range(num_hosts):
        pages = [
            f"https://{hosts[h]}/s{h}/p{k}" for k in range(max(1, int(counts[h])))
        ]
        host_pages.append(pages)
    all_urls = [u for pages in host_pages for u in pages]
    url_set = set(all_urls)
    n = len(all_urls)

    # --- per-page roles ---
    dup_of: Dict[str, str] = {}
    tiny = set()
    non_html = set()
    err_status: Dict[str, int] = {}
    for i, u in enumerate(all_urls):
        r = rng.rand()
        if r < 0.02 and i > 10:
            # duplicate an earlier page so its spans exist when cloning
            src = all_urls[rng.randint(0, i)]
            if src != u and src not in dup_of:
                dup_of[u] = src
        elif r < 0.04:
            tiny.add(u)
        elif r < 0.06:
            non_html.add(u)
        elif r < 0.08:
            err_status[u] = int(rng.choice([404, 500, 503]))

    def make_hrefs(h: int, idx: int, url: str) -> List[tuple]:
        """(anchor_text, raw_href) pairs for one page — raw, pre-normalize."""
        pages = host_pages[h]
        hrefs: List[tuple] = []
        # intra-host chain keeps every page of a reached host reachable
        if idx + 1 < len(pages):
            nxt = pages[idx + 1]
            # vary raw form: relative path / http:// / trailing slash / fragment
            form = rng.randint(0, 4)
            path = "/" + nxt.split("/", 3)[3]
            raw = [
                path,
                nxt.replace("https://", "http://"),
                nxt + "/",
                nxt + "#section-2",
            ][form]
            hrefs.append(("next page", raw))
        # host ring: page 0 links to next host's page 0
        if idx == 0 and num_hosts > 1:
            hrefs.append(("ring", host_pages[(h + 1) % num_hosts][0]))
        # random intra/cross-host links
        for _ in range(int(rng.randint(1 + extra_links, 4 + extra_links))):
            tgt = all_urls[rng.randint(0, n)]
            if rng.rand() < 0.2:
                tgt = tgt.replace("https://", "HTTP://").replace("/s", "/%73")
            hrefs.append((_page_words(rng, 2), tgt))
        # one invalid / trap / dead link each with some probability
        r = rng.rand()
        if r < 0.15:
            hrefs.append(("bad scheme", "mailto:someone@" + hosts[h]))
        elif r < 0.30:
            trap = rng.choice(
                [
                    f"https://{hosts[h]}/a/b/a/b",          # duplicate segments
                    f"https://{hosts[h]}/wiki/doku.php",     # doku trap
                    f"https://{hosts[h]}/files/doc.pdf",     # ext blacklist
                    f"https://{hosts[h]}/cal?ical=1",        # banned query param
                    f"https://{hosts[h]}/p?afg3_page_id=9",  # afg param
                    f"https://{hosts[h]}/p?color_filter=red",  # 'filter' param
                    f"https://ext{h}.other.net/offsite",     # external domain
                ]
            )
            hrefs.append(("trap", trap))
        elif r < 0.40:
            hrefs.append(("dead", f"https://{hosts[h]}/missing/m{rng.randint(0, 10_000)}"))
        return hrefs

    # --- build spans per page ---
    doc_ids: List[str] = []
    spans_col: List[Optional[List[dict]]] = []
    status_col: List[int] = []
    bytes_col: List[int] = []
    html_col: List[bool] = []
    page_spans: Dict[str, List[dict]] = {}

    for h in range(num_hosts):
        for idx, url in enumerate(host_pages[h]):
            spans: List[dict] = []
            off = 0

            def add(kind: str, text: str, media_ref: str = ""):
                nonlocal off
                spans.append(
                    {"kind": kind, "text": text, "media_ref": media_ref, "offset": off}
                )
                off += 1

            if url in dup_of:
                # exact-duplicate content: clone the source page's spans
                src_spans = page_spans[dup_of[url]]
                for s in src_spans:
                    add(s["kind"], s["text"], s["media_ref"])
            else:
                add("title", f"{_page_words(rng, 3)} p{idx}")
                n_words = 3 if url in tiny else int(rng.randint(8, 40)) * words_scale
                add("h1", _page_words(rng, 2))
                if rng.rand() < 0.5:
                    add("h2", _page_words(rng, 2))
                if rng.rand() < 0.3:
                    add("h3", _page_words(rng, 2))
                for _ in range(1 if url in tiny else int(rng.randint(2, 6))):
                    add("text", _page_words(rng, n_words))
                if rng.rand() < 0.4:
                    add("strong", _page_words(rng, 1))
                if rng.rand() < 0.3:
                    add("script", "var x = 1;")
                if rng.rand() < 0.2:
                    add("style", ".c { color: red }")
                if rng.rand() < 0.15:
                    add("code", "print('hi')")
                for _ in range(int(rng.randint(0, 3))):
                    add("image", _page_words(rng, 2), f"media://{rng.randint(0, 1 << 30):08x}")
                for anchor, href in make_hrefs(h, idx, url):
                    add("link", anchor, href)

            page_spans[url] = spans
            doc_ids.append(url)
            spans_col.append(spans)
            status_col.append(err_status.get(url, 200))
            text_bytes = sum(len(s["text"]) + 24 for s in spans) + 120
            bytes_col.append(160 if url in tiny else text_bytes)
            html_col.append(url not in non_html)

    docs = pa.Table.from_arrays(
        [
            pa.array(doc_ids, pa.string()),
            pa.array(spans_col, DOCS_SCHEMA.field("spans").type),
            pa.array(status_col, pa.int32()),
            pa.array(bytes_col, pa.int64()),
            pa.array(html_col, pa.bool_()),
        ],
        schema=DOCS_SCHEMA,
    )

    # --- robots fixtures: one disallowed subtree, one slow host, one absent ---
    robots_rows = []
    if num_hosts > 1:
        robots_rows.append(
            (hosts[1], "User-agent: *\nDisallow: /s1/p1\n", None)
        )
    if num_hosts > 2:
        robots_rows.append(
            (hosts[2], "User-agent: *\nCrawl-delay: 2\n", 2.0)
        )
    for h in range(4, num_hosts):
        if rng.rand() < 0.3:
            robots_rows.append((hosts[h], "User-agent: *\nAllow: /\n", None))
    robots = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in robots_rows], pa.string()),
            pa.array([r[1] for r in robots_rows], pa.string()),
            pa.array([r[2] for r in robots_rows], pa.float64()),
        ],
        schema=ROBOTS_SCHEMA,
    )

    # --- seeds: raw (un-normalized) forms of the first pages ---
    seed_urls = [host_pages[0][0].replace("https://", "HTTP://")]
    if num_hosts > 3:
        seed_urls.append(host_pages[3][0] + "/")
    seeds = pa.Table.from_arrays(
        [pa.array(seed_urls, pa.string())], schema=SEEDS_SCHEMA
    )
    return {"docs": docs, "robots": robots, "seeds": seeds}


def write_web(tables: Dict[str, pa.Table], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, table in tables.items():
        # bounded row groups: keeps every nested-column chunk far below
        # Arrow's 2 GiB 32-bit-offset ceiling on read, and gives the fetch
        # join's predicate pushdown row-group granularity to prune against
        pq.write_table(
            table, os.path.join(out_dir, f"{name}.parquet"), row_group_size=16384
        )


def generate_and_write(
    out_dir: str, seed: int = 42, num_hosts: int = 5, num_docs: int = 50, **kw
) -> Dict[str, pa.Table]:
    tables = generate_web(seed=seed, num_hosts=num_hosts, num_docs=num_docs, **kw)
    write_web(tables, out_dir)
    return tables
