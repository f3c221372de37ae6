"""Link extraction + validity filtering + crawl-side analytics stages.

Re-expression of scraper()/extract_next_links (web_crawler/utils/
scraper.py:9-27, M3/M9) and the worker's tokenize/frequency pass
(worker.py:90-98, A1/A2) as vectorized ``map_batches`` bodies over the
fetched-pages batch. Link spans are scanned in offset order, resolved
against the page URL, validity-filtered BEFORE normalization (reference
order: is_valid runs on the raw resolved URL, normalize happens inside
add_url — frontier.py:137-139), then normalized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import text as T
from ..functions import urls as U


def extract_links_batch(batch: pa.Table, root_domains: tuple) -> pa.Table:
    """fetched pages -> candidate frontier rows
    (url, host, parent_seq, offset, depth)."""
    spans_col = batch.column("spans").to_pylist()
    page_urls = batch.column("url").to_pylist()
    parent_seqs = batch.column("seq").to_pylist()
    depths = batch.column("depth").to_pylist()

    out_url, out_host, out_parent, out_offset, out_depth = [], [], [], [], []
    for page_url, pseq, depth, spans in zip(page_urls, parent_seqs, depths, spans_col):
        if not spans:
            continue
        hrefs = [
            (s["offset"], s["media_ref"])
            for s in spans
            if s["kind"] == "link" and s["media_ref"]
        ]
        hrefs.sort()
        offsets = [o for o, _ in hrefs]
        resolved = U.resolve_links(page_url, [h for _, h in hrefs])
        mask = U.is_valid_batch(resolved, root_domains)
        keep = [i for i in range(len(resolved)) if mask[i]]
        normd = U.normalize_batch([resolved[i] for i in keep])
        for j, i in enumerate(keep):
            out_url.append(normd[j])
            out_offset.append(offsets[i])
        out_parent.extend([pseq] * len(keep))
        out_depth.extend([depth + 1] * len(keep))
    out_host.extend(U.host_batch(out_url))

    return pa.Table.from_arrays(
        [
            pa.array(out_url, pa.string()),
            pa.array(out_host, pa.string()),
            pa.array(out_parent, pa.int64()),
            pa.array(out_offset, pa.int32()),
            pa.array(out_depth, pa.int32()),
        ],
        names=["url", "host", "parent_seq", "offset", "depth"],
    )


def analyze_batch(batch: pa.Table) -> pa.Table:
    """Crawl-profile tokenization per page (worker.py:91-98): emits one row
    per page with url/seq/length plus the page's distinct tokens + counts as
    list columns (exploded later for the global frequency aggregate, A1)."""
    spans_col = batch.column("spans").to_pylist()
    urls = batch.column("url").to_pylist()
    seqs = batch.column("seq").to_pylist()

    lengths = np.zeros(len(urls), dtype=np.int64)
    token_lists, count_lists = [], []
    for i, spans in enumerate(spans_col):
        spans = sorted(spans, key=lambda s: s["offset"]) if spans else []
        frags = T.extract_profile_text(
            [s["kind"] for s in spans], [s["text"] for s in spans], T.PROFILE_CRAWL
        )
        freqs = T.compute_word_frequencies(T.tokenize(" ".join(frags)))
        lengths[i] = sum(freqs.values())
        token_lists.append(list(freqs.keys()))
        count_lists.append(list(freqs.values()))

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(seqs, pa.int64()),
            pa.array(lengths, pa.int64()),
            pa.array(token_lists, pa.list_(pa.string())),
            pa.array(count_lists, pa.list_(pa.int64())),
        ],
        names=["url", "seq", "length", "tokens", "counts"],
    )


def explode_token_partials(batch: pa.Table) -> pa.Table:
    """(tokens, counts) list columns -> pre-aggregated (token, count) rows —
    the within-batch combiner ahead of the global groupby(token).sum
    shuffle (A1; reference merges worker-local dicts under a lock,
    worker.py:113-120). Pure Arrow: ``pa.Table.group_by`` is the C-level
    hash aggregate — no pandas in the crawl hot path."""
    tokens = batch.column("tokens").combine_chunks()
    counts = batch.column("counts").combine_chunks()
    flat_tokens = tokens.flatten()
    flat_counts = counts.flatten()
    if len(flat_tokens) == 0:
        return pa.Table.from_arrays(
            [pa.array([], pa.string()), pa.array([], pa.int64())],
            names=["token", "count"],
        )
    flat = pa.table({"token": flat_tokens, "count": flat_counts})
    agg = flat.group_by("token").aggregate([("count", "sum")])
    return agg.select(["token", "count_sum"]).rename_columns(["token", "count"])
