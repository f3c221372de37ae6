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
    (url, host, parent_seq, offset, depth).

    The span scan is columnar: link spans are selected with Arrow kernels
    (the full span payload never round-trips through Python — only the
    href strings of actual link spans do); per-link resolve/validate/
    normalize stays the reference's urllib chain."""
    import pyarrow.compute as pc

    page_urls = batch.column("url").to_pylist()
    parent_seqs = batch.column("seq").to_pylist()
    depths = batch.column("depth").to_pylist()

    sc = batch.column("spans").combine_chunks()
    lengths = (
        pc.fill_null(pc.list_value_length(sc), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = sc.flatten()
    out_url, out_host, out_parent, out_offset, out_depth = [], [], [], [], []
    if len(flat):
        row_rep = np.repeat(np.arange(len(sc), dtype=np.int64), lengths)
        media = flat.field("media_ref")
        is_link = pc.and_kleene(
            pc.equal(flat.field("kind"), "link"),
            pc.and_kleene(pc.is_valid(media), pc.not_equal(media, "")),
        )
        sel0 = np.nonzero(
            pc.fill_null(is_link, False).to_numpy(zero_copy_only=False).astype(bool)
        )[0]
        if len(sel0):
            offs0 = flat.field("offset").to_numpy(zero_copy_only=False)[sel0]
            pages0 = row_rep[sel0]
            media0 = np.array(
                pc.take(media, pa.array(sel0, pa.int64())).to_pylist(), dtype=object
            )
            # per page the reference sorts (offset, href) tuples — lexsort
            # replicates the href tiebreak on equal offsets
            order = np.lexsort((media0, offs0, pages0))
            pages_s, offs_s, media_s = pages0[order], offs0[order], media0[order]
            # resolve stays per page (urljoin is base-relative); validity,
            # normalize and host run ONCE over the whole batch's links —
            # the vectorized Arrow kernels (functions/urls.py) amortize
            # across pages instead of re-dispatching per page group
            resolved_all: list = []
            starts = np.concatenate(
                ([0], np.nonzero(pages_s[1:] != pages_s[:-1])[0] + 1, [len(pages_s)])
            )
            for gi in range(len(starts) - 1):
                a, b = starts[gi], starts[gi + 1]
                resolved_all.extend(
                    U.resolve_links(page_urls[int(pages_s[a])], list(media_s[a:b]))
                )
            mask = U.is_valid_batch(resolved_all, root_domains)
            keep = np.nonzero(mask)[0]
            if len(keep):
                out_url = U.normalize_batch([resolved_all[int(i)] for i in keep])
                out_offset = offs_s[keep].tolist()
                kept_pages = pages_s[keep]
                out_parent = [parent_seqs[int(p)] for p in kept_pages]
                out_depth = [depths[int(p)] + 1 for p in kept_pages]
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
    list columns (exploded later for the global frequency aggregate, A1).

    Fully vectorized: the profile join and the T1 tokenizer run as Arrow
    kernels (functions/text.profile_joined_text_batch /
    t1_token_page_counts, equivalence-tested against the per-row path);
    within-page token order is unspecified — every consumer aggregates."""
    n = batch.num_rows
    pages, tokens, counts, page_lengths = T.t1_profile_page_counts(
        batch.column("spans"), T.PROFILE_CRAWL
    )

    per_page = np.bincount(pages, minlength=n)
    offsets = np.concatenate(([0], np.cumsum(per_page)))
    token_lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), tokens)
    count_lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(counts, pa.int64())
    )
    return pa.Table.from_arrays(
        [
            batch.column("url"),
            batch.column("seq"),
            pa.array(page_lengths, pa.int64()),
            token_lists,
            count_lists,
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
