"""Explicit Arrow schemas for every engine table.

The reference has only implicit dict schemas (SURVEY.md §1); here every
table is a declared ``pyarrow.Schema``. The ``docs`` schema is fixed by the
input contract: a table of interleaved text+media documents,
``doc_id: string`` + ``spans: list<struct<kind, text, media_ref, offset>>``.

Tables are stored as Parquet directories (Lance is not installed in this
environment; ``sources.docs_io`` gates on the import and uses
``lance.write_dataset`` / ``ray.data.read_lance`` when available — the
schemas are identical either way).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

# Primary input: the synthetic web (one row per fetchable page).
DOCS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),  # canonical URL (normalize() applied)
        pa.field("spans", pa.list_(SPAN_STRUCT)),
        # fetch metadata (FIXTURES.md §2 companion columns, inlined):
        pa.field("status", pa.int32()),
        pa.field("content_bytes", pa.int64()),
        pa.field("is_html", pa.bool_()),
    ]
)

SPAN_KINDS = (
    "text", "title", "h1", "h2", "h3", "strong", "link", "image",
    "script", "style", "code",
)

ROBOTS_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("body", pa.string()),          # raw robots.txt text
        pa.field("crawl_delay", pa.float64()),  # nullable mirror of Crawl-delay
    ]
)

SEEDS_SCHEMA = pa.schema([pa.field("url", pa.string())])

# Frontier rows flowing between waves.
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),        # canonical
        pa.field("host", pa.string()),
        pa.field("discovery_seq", pa.int64()),  # global discovery order (priority)
        pa.field("depth", pa.int32()),
    ]
)

# Crawl ledger (the reference's discovered_urls dict, frontier.py:21).
SEEN_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("downloaded", pa.bool_()),
        pa.field("length", pa.int64()),
    ]
)

# Fetch lineage: one row per dispensed URL, in dispatch order.
LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64()),       # global dispatch order
        pa.field("wave", pa.int32()),
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("virtual_ts", pa.float64()),
        pa.field("status", pa.int32()),
    ]
)

POSTINGS_SCHEMA = pa.schema(
    [
        pa.field("token", pa.string()),
        pa.field("doc_id", pa.int64()),
        pa.field("tf_idf", pa.float64()),
    ]
)

CATALOG_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("title", pa.string()),
    ]
)
