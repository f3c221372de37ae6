"""Conformance web: a crawl input derived ARITHMETICALLY from the testdata
``documents`` table, mirrorable in pure SQL.

The synthetic web (synthetic_web.py) exercises every crawl edge case but is
RNG-generated — no SQL oracle can rebuild it. This builder gives the driver
correctness gate a second web whose every element is a pure function of
``doc_id``, so `__ray_entry__.oracle_sql` can replay the whole crawl
(politeness waves, carryover, robots blocking, within-/cross-wave dedup)
as an unrolled wave-by-wave DuckDB query (conformance_sql.py) and then
recompute frequencies / page lengths / tf-idf postings / search results
from the same ``documents`` view.

Construction (N = 50 docs, H = 5 hosts; all constants shared with
conformance_sql.py):

    host(d)  = h{d % 5}.conf.org         url(d) = https://host(d)/p{d}
    title(d) = "conf doc {d}"
    text(d)  = documents.text[d] filtered to VOCAB words (identity on the
               shipped testdata — the filter only guarantees the SQL
               stem map is total on any input)
    links(d) = offsets 100/200/300 → children 3d+1, 3d+2, 3d+3 (<N);
               offset 400 → (7d+3) % N  (cross edges: cycles + shared
               discoveries exercise cross-wave dedup);
               offset 500 → 3d+1 again  (within-page duplicate exercises
               within-wave first-wins dedup)
    robots   = h1: Crawl-delay 1;  h3: Disallow /p1  (blocks p13, p18)
    seeds    = [url(0)];  politeness 0.5;  wave_span 2.0 → slots/wave:
               4 on h0/h2/h3/h4, 2 on h1 → real carryover every wave.

Reference semantics exercised end-to-end: frontier politeness + robots
(frontier.py:84-135), first-wins URL dedup (frontier.py:137-146), and the
worker tokenize/length pass (worker.py:90-98).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import DOCS_SCHEMA
from .synthetic_web import CrawlConfig

CONF_N = 50
CONF_HOSTS = 5
CONF_ROOT = "conf.org"
CONF_WAVE_SPAN = 2.0
CONF_POLITENESS = 0.5

# Union of the testdata generator's document vocabulary (all three sf
# dirs) — the page-text filter list. Tokens outside it are dropped on BOTH
# sides so the SQL Porter-stem map (conformance_sql.STEM_MAP) stays total.
CONF_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()

ROBOTS_BODIES = {
    f"h1.{CONF_ROOT}": "User-agent: *\nCrawl-delay: 1\n",
    f"h3.{CONF_ROOT}": "User-agent: *\nDisallow: /p1\n",
}


def conf_host(d: int) -> str:
    return f"h{d % CONF_HOSTS}.{CONF_ROOT}"


def conf_url(d: int) -> str:
    return f"https://{conf_host(d)}/p{d}"


def conf_links(d: int) -> List[Tuple[int, int]]:
    """(offset, target doc) pairs — keep in sync with conformance_sql."""
    out = []
    for off, t in ((100, 3 * d + 1), (200, 3 * d + 2), (300, 3 * d + 3),
                   (400, (7 * d + 3) % CONF_N), (500, 3 * d + 1)):
        if t < CONF_N:
            out.append((off, t))
    return out


def conf_config() -> CrawlConfig:
    return CrawlConfig(
        root_domains=(CONF_ROOT,),
        politeness=CONF_POLITENESS,
        wave_span=CONF_WAVE_SPAN,
        num_seen_shards=4,
    )


def conf_seeds() -> List[str]:
    return [conf_url(0)]


def build_conformance_web(sf_dir: str, out_dir: str) -> str:
    """Write the conformance docs table derived from sf_dir's documents
    (first CONF_N doc_ids); returns the docs.parquet path."""
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    texts: Dict[int, str] = {
        int(r["doc_id"]): r["text"]
        for r in src.to_pylist()
        if int(r["doc_id"]) < CONF_N
    }
    vocab = frozenset(CONF_VOCAB)

    doc_ids, spans_col, status_col, bytes_col, html_col = [], [], [], [], []
    for d in sorted(texts):
        txt = " ".join(w for w in texts[d].split() if w in vocab)
        spans = [
            {"kind": "title", "text": f"conf doc {d}", "media_ref": "", "offset": 0},
            {"kind": "text", "text": txt, "media_ref": "", "offset": 10},
            {"kind": "image", "text": "img", "media_ref": f"media://conf{d:04x}",
             "offset": 50},
        ]
        for off, t in conf_links(d):
            spans.append(
                {"kind": "link", "text": "", "media_ref": conf_url(t), "offset": off}
            )
        doc_ids.append(conf_url(d))
        spans_col.append(spans)
        status_col.append(200)
        bytes_col.append(300 + len(txt))
        html_col.append(True)

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
    path = os.path.join(out_dir, "docs.parquet")
    pq.write_table(docs, path)
    return path
