"""Pure-Python conformance oracle.

A single-threaded, in-process model of the engine's semantics, re-derived
from the reference (NOT imported from it, NOT a copy):

- crawl: the reference frontier/worker loop (web_crawler/crawler/
  frontier.py:84-152, worker.py:53-127) under the engine's **virtual-time
  wave model** (SURVEY.md §7.4). Wall clocks are replaced by a per-wave
  virtual span Δ; a host with effective delay d = max(robots crawl_delay,
  politeness) dispenses ⌊Δ/d⌋ URLs per wave in discovery order (slot i →
  virtual_ts = wave_start + i·d; a host's first wave spends slot 0 on the
  robots fetch, mirroring create_robot stamping the clock,
  frontier.py:75-77). Global dispatch order within a wave is
  (virtual_ts, host, discovery_seq). With Δ→∞ this degenerates to pure
  per-host FIFO — the single-worker reference order.
- index: inverted_indexer semantics (worker.py:144-166, __init__.py:162-201)
  with doc ids = crawl dispatch order (stable, unlike the reference's
  directory-enumeration ids — SURVEY.md §7.6 hazard 2) and global
  first-wins exact dedup (single-process semantics).
- search: start_search_engine.py:29-115 semantics (n-gram query, postings
  lookup, per-doc tf-idf sum, top-5), via exact token match instead of
  byte-seek files.

The Ray pipelines must reproduce these outputs exactly; pytest asserts it.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlparse
from urllib.robotparser import RobotFileParser

import pyarrow as pa

from .functions import text as T
from .functions import urls as U
from .functions.hashing import poly_hash
from .functions.postings import dedup_text, doc_term_frequencies, page_title
from .sources.synthetic_web import CrawlConfig


@dataclass
class CrawlResult:
    # lineage: (seq, wave, url, host, virtual_ts, status) in dispatch order
    lineage: List[Tuple[int, int, str, str, float, int]] = field(default_factory=list)
    # seen ledger: url -> (downloaded, length); insertion = discovery order
    seen: Dict[str, Tuple[bool, int]] = field(default_factory=dict)
    frequencies: Dict[str, int] = field(default_factory=dict)
    page_lengths: Dict[str, int] = field(default_factory=dict)
    # url -> doc row (for the indexer stage); only pages with a docs row
    fetched_pages: Dict[str, dict] = field(default_factory=dict)


def _docs_lookup(docs: pa.Table) -> Dict[str, dict]:
    return {r["doc_id"]: r for r in docs.to_pylist()}


def _robots_lookup(robots: pa.Table) -> Dict[str, RobotFileParser]:
    out = {}
    for row in robots.to_pylist():
        rp = RobotFileParser()
        rp.parse(row["body"].splitlines())
        out[row["host"]] = rp
    return out


def _span_links(spans: List[dict]) -> List[str]:
    return [
        s["media_ref"]
        for s in sorted(spans, key=lambda s: s["offset"])
        if s["kind"] == "link" and s["media_ref"]
    ]


def _should_scrape(row: Optional[dict]) -> bool:
    """worker.py:53-71 gates over fetch metadata columns."""
    if row is None:
        return False
    return (
        row["status"] == 200
        and row["content_bytes"] >= 256
        and bool(row["is_html"])
    )


def oracle_crawl(
    docs: pa.Table,
    robots: pa.Table,
    seeds: List[str],
    config: CrawlConfig,
    max_waves: int = 100_000,
) -> CrawlResult:
    res = CrawlResult()
    doc_map = _docs_lookup(docs)
    robot_map = _robots_lookup(robots)

    frontier: List[Tuple[int, str, str]] = []  # (discovery_seq, url, host)
    seq_counter = 0

    def add_url(raw_url: str):
        nonlocal seq_counter
        url = U.normalize(raw_url)
        if url in res.seen:
            return
        res.seen[url] = (False, 0)
        frontier.append((seq_counter, url, urlparse(url).netloc))
        seq_counter += 1

    for s in seeds:
        add_url(s)

    robots_fetched: set = set()
    dispatch_counter = 0
    wave = 0
    while frontier and wave < max_waves:
        wave_start = wave * config.wave_span
        by_host: Dict[str, List[Tuple[int, str, str]]] = {}
        for entry in frontier:
            by_host.setdefault(entry[2], []).append(entry)
        frontier = []  # refilled by add_url (new discoveries) + carryover
        carryover: List[Tuple[int, str, str]] = []
        dispensed: List[Tuple[float, str, int, str]] = []  # (vts, host, seq, url)

        for host in sorted(by_host):
            entries = sorted(by_host[host], key=lambda e: e[0])
            robot = robot_map.get(host)
            slot = 0
            if host not in robots_fetched:
                robots_fetched.add(host)
                slot = 1  # robots fetch stamps the host clock (frontier.py:75-77)
            crawl_delay = robot.crawl_delay(config.user_agent) if robot else None
            delay = max(crawl_delay or 0.0, config.politeness)
            slots = max(1, int(config.wave_span / delay))
            for seq, url, _h in entries:
                if robot is not None and not robot.can_fetch(config.user_agent, url):
                    # disallowed: marked complete, no slot burned (frontier.py:112-114)
                    res.seen[url] = (True, 0)
                    continue
                if slot < slots:
                    dispensed.append((wave_start + slot * delay, host, seq, url))
                    slot += 1
                else:
                    carryover.append((seq, url, host))

        dispensed.sort(key=lambda d: (d[0], d[1], d[2]))
        for vts, host, seq, url in dispensed:
            row = doc_map.get(url)
            status = row["status"] if row is not None else 404
            res.lineage.append((dispatch_counter, wave, url, host, vts, status))
            dispatch_counter += 1
            res.seen[url] = (True, 0)
            if row is not None:
                res.fetched_pages[url] = row
            if _should_scrape(row):
                links = _span_links(row["spans"])
                resolved = U.resolve_links(url, links)
                for link in resolved:
                    if U.is_valid(link, config.root_domains):
                        add_url(link)
                # crawl-profile tokenization (worker.py:91-98)
                spans = sorted(row["spans"], key=lambda s: s["offset"])
                frags = T.extract_profile_text(
                    [s["kind"] for s in spans],
                    [s["text"] for s in spans],
                    T.PROFILE_CRAWL,
                )
                freqs = T.compute_word_frequencies(T.tokenize(" ".join(frags)))
                for k, v in freqs.items():
                    res.frequencies[k] = res.frequencies.get(k, 0) + v
                length = sum(freqs.values())
                res.page_lengths[url] = length
                res.seen[url] = (True, length)

        frontier = sorted(frontier + carryover, key=lambda e: e[0])
        wave += 1
    return res


# --- indexer oracle ----------------------------------------------------------


@dataclass
class IndexResult:
    # token -> list of (doc_id, tf_idf) in doc_id order, pruned + scored
    postings: Dict[str, List[Tuple[int, float]]]
    catalog: List[Tuple[int, str, str]]          # (doc_id, url, title)
    duplicates: List[Tuple[int, str, int, str]]  # (dup_doc_id, dup_url, kept_doc_id, kept_url)
    n_indexed: int


def oracle_index(crawl: CrawlResult, min_ngram_df: int = 10) -> IndexResult:
    """Index the fetched pages in dispatch order (doc id = lineage seq)."""
    raw_postings: Dict[str, List[Tuple[int, int]]] = {}  # token -> [(doc_id, tf)]
    catalog: List[Tuple[int, str, str]] = []
    duplicates: List[Tuple[int, str, int, str]] = []
    page_hashes: Dict[int, Tuple[int, str]] = {}

    for seq, wave, url, host, vts, status in crawl.lineage:
        row = crawl.fetched_pages.get(url)
        # is_valid_html gate (indexer/worker.py:10-12) + empty content
        if row is None or not row["is_html"] or row["status"] != 200:
            continue
        if row["content_bytes"] > 10_000_000:  # indexer/__init__.py:103
            continue
        text = dedup_text(row["spans"])
        h = poly_hash(text)
        if h in page_hashes:
            duplicates.append((seq, url, page_hashes[h][0], page_hashes[h][1]))
            continue
        page_hashes[h] = (seq, url)
        for token, tf in doc_term_frequencies(row["spans"]).items():
            raw_postings.setdefault(token, []).append((seq, tf))
        catalog.append((seq, url, page_title(row["spans"], url)))

    n = len(catalog)
    postings: Dict[str, List[Tuple[int, float]]] = {}
    for token in sorted(raw_postings):
        plist = sorted(raw_postings[token])
        df = len(plist)
        if " " in token and df < min_ngram_df:
            continue  # n-gram pruning (indexer/__init__.py:188-190)
        idf = math.log(n / df)
        postings[token] = [
            (doc_id, math.floor((1 + math.log(tf)) * idf * 1000.0 + 0.5) / 1000.0)
            for doc_id, tf in plist
        ]
    return IndexResult(postings, catalog, duplicates, n)


# --- search oracle -----------------------------------------------------------


def oracle_search(index: IndexResult, query: str, k: int = 5) -> List[Tuple[int, float, str, str]]:
    """Top-k (doc_id, score, url, title) for a query
    (start_search_engine.py:29-115)."""
    primary, fallback = T.query_tokens(query)
    cat = {doc_id: (url, title) for doc_id, url, title in index.catalog}

    def run(tokens: List[str]):
        scores: Dict[int, float] = {}
        for tok in tokens:
            for doc_id, tf_idf in index.postings.get(tok, ()):
                scores[doc_id] = scores.get(doc_id, 0.0) + tf_idf
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, s, cat[d][0], cat[d][1]) for d, s in ranked if d in cat]

    results = run(primary)
    if not results:
        results = run(fallback)
    return results
