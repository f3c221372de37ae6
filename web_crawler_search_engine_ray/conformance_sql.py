"""DuckDB oracle SQL for the conformance-web crawl/index/search queries.

An INDEPENDENT re-derivation of the crawl semantics in pure SQL (no shared
code with the engine or with oracle.py): the BFS politeness wave loop is
unrolled wave-by-wave as generated CTEs (window functions per wave — no
recursive CTE needed because the wave count of the fixed conformance web
is bounded), and the index/search math is recomputed relationally from the
``documents`` view.

Mirrored semantics, with reference citations:
- per-host FIFO slots under max(crawl_delay, politeness), first-ever wave
  burns slot 0 on the robots fetch (frontier.py:84-135, 75-77)
- robots Disallow never burns a slot (frontier.py:112-114)
- unscheduled URLs carry over with preserved discovery order
- dispatch order (virtual_ts, host, discovery_seq); discovery order
  (parent dispatch order, span offset); within-wave first-wins dedup and
  cross-wave seen-set dedup (frontier.py:137-146)
- T1 tokenize / page length (worker.py:90-98)
- posting n-grams (uni+bi+tri, all-numeric grams dropped), raw ∪
  stemmed-first-wins merge, title tag bump +(100000-1), df pruning of
  multi-word tokens, tf-idf (1+ln tf)·ln(N/df) (shared/tokenizer.py:50-63,
  shared/posting.py:7-28, indexer/__init__.py:188-198)

The Porter stems of the (closed) conformance vocabulary are inlined as a
literal map — hand-checkable constants of the published Porter (1980)
algorithm, NOT computed by the engine's stemmer.
"""

from __future__ import annotations

from .sources.conformance_web import CONF_N, CONF_VOCAB

# Porter (1980) stems for every token the conformance web can contain:
# the CONF_VOCAB words plus the title words ("conf", "doc", digit strings
# are fixed points and need no entry). Only non-fixed-points are listed.
STEM_MAP = {
    "customer": "custom",
    "key": "kei",
    "merge": "merg",
    "query": "queri",
    "table": "tabl",
    "value": "valu",
}

MAX_WAVES = 10  # the 50-doc conformance crawl finishes in 7; empty waves no-op

_VOCAB_SQL = "['" + "', '".join(CONF_VOCAB) + "']"

# scalar helpers over the doc number d (keep in sync with conformance_web)
_HOST = "('h' || (d % 5) || '.conf.org')"
_URL = "('https://h' || (d % 5) || '.conf.org/p' || d)"
_BLOCKED = "((d % 5) = 3 AND CAST(d AS VARCHAR) LIKE '1%')"
_DELAY = "(CASE WHEN (d % 5) = 1 THEN 1.0 ELSE 0.5 END)"
_SLOTS = "(CASE WHEN (d % 5) = 1 THEN 2 ELSE 4 END)"


def _base_ctes() -> str:
    return f"""
conf AS MATERIALIZED (
  SELECT CAST(doc_id AS BIGINT) AS d,
         array_to_string(
           list_filter(string_split(text, ' '), w -> list_contains({_VOCAB_SQL}, w)),
           ' ') AS txt
  FROM documents WHERE doc_id < {CONF_N}
),
linkrows AS MATERIALIZED (
  SELECT d AS src, 100 AS off, 3*d+1 AS tgt FROM conf WHERE 3*d+1 < {CONF_N}
  UNION ALL SELECT d, 200, 3*d+2 FROM conf WHERE 3*d+2 < {CONF_N}
  UNION ALL SELECT d, 300, 3*d+3 FROM conf WHERE 3*d+3 < {CONF_N}
  UNION ALL SELECT d, 400, (7*d+3) % {CONF_N} FROM conf
  UNION ALL SELECT d, 500, 3*d+1 FROM conf WHERE 3*d+1 < {CONF_N}
)"""


def _wave_ctes(k: int) -> str:
    """One politeness wave: slot assignment, dispatch, carryover, link
    discovery with within-wave first-wins + cross-wave seen dedup."""
    return f"""
alw{k} AS MATERIALIZED (
  SELECT d, dseq,
         row_number() OVER (PARTITION BY d % 5 ORDER BY dseq) - 1
           + (CASE WHEN (d % 5) IN (SELECT hid FROM hseen{k}) THEN 0 ELSE 1 END)
           AS slot
  FROM f{k} WHERE NOT {_BLOCKED}
),
fet{k} AS MATERIALIZED (
  SELECT d, dseq, {k} AS wave, {k} * 2.0 + slot * {_DELAY} AS vts
  FROM alw{k} WHERE slot < {_SLOTS}
),
car{k} AS MATERIALIZED (SELECT d, dseq FROM alw{k} WHERE slot >= {_SLOTS}),
hseen{k + 1} AS MATERIALIZED (
  SELECT hid FROM hseen{k} UNION SELECT DISTINCT d % 5 AS hid FROM f{k}
),
lk{k} AS MATERIALIZED (
  SELECT l.tgt AS d, f.vts AS pvts, f.d % 5 AS phid, f.dseq AS pdseq, l.off AS off
  FROM fet{k} f JOIN linkrows l ON l.src = f.d
),
fresh{k} AS MATERIALIZED (
  SELECT d,
         (SELECT c FROM cnt{k})
           + row_number() OVER (ORDER BY pvts, phid, pdseq, off) - 1 AS dseq
  FROM (
    SELECT *, row_number() OVER (
        PARTITION BY d ORDER BY pvts, phid, pdseq, off) AS rn
    FROM lk{k}
  ) WHERE rn = 1 AND d NOT IN (SELECT d FROM seen{k})
),
seen{k + 1} AS MATERIALIZED (SELECT d FROM seen{k} UNION SELECT d FROM fresh{k}),
cnt{k + 1} AS MATERIALIZED (
  SELECT (SELECT c FROM cnt{k}) + (SELECT count(*) FROM fresh{k}) AS c
),
f{k + 1} AS MATERIALIZED (SELECT d, dseq FROM car{k} UNION ALL SELECT d, dseq FROM fresh{k})"""


def lineage_with() -> str:
    """WITH-clause body ending in `lin(seq, url, host, virtual_ts, status,
    wave, d)` — the unrolled crawl."""
    parts = [
        _base_ctes(),
        """
f0 AS MATERIALIZED (SELECT 0 AS d, 0 AS dseq),
hseen0 AS MATERIALIZED (SELECT NULL::BIGINT AS hid WHERE 1 = 0),
cnt0 AS MATERIALIZED (SELECT 1::BIGINT AS c),
seen0 AS MATERIALIZED (SELECT d FROM f0)""",
    ]
    for k in range(MAX_WAVES):
        parts.append(_wave_ctes(k))
    fet_union = "\n  UNION ALL ".join(
        f"SELECT * FROM fet{k}" for k in range(MAX_WAVES)
    )
    parts.append(
        f"""
allfet AS MATERIALIZED (
  {fet_union}
),
lin AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY wave, vts, d % 5, dseq) - 1 AS seq,
         {_URL} AS url, {_HOST} AS host,
         vts AS virtual_ts, 200 AS status, wave, d, dseq
  FROM allfet
)"""
    )
    return "WITH " + ",".join(parts)


CRAWL_LINEAGE_SQL = (
    lineage_with()
    + """
SELECT seq, url, host, virtual_ts, status, wave FROM lin
"""
)

CRAWL_FREQUENCIES_SQL = (
    lineage_with()
    + """
SELECT t AS token, count(*)::BIGINT AS count
FROM (
  SELECT unnest(regexp_extract_all(c.txt, '[a-z0-9]+')) AS t
  FROM lin JOIN conf c ON c.d = lin.d
)
GROUP BY t
"""
)

CRAWL_PAGE_LENGTHS_SQL = (
    lineage_with()
    + """
SELECT lin.url, lin.seq, len(regexp_extract_all(c.txt, '[a-z0-9]+'))::BIGINT AS length
FROM lin JOIN conf c ON c.d = lin.d
"""
)


def _stem_map_sql() -> str:
    rows = ", ".join(f"('{w}', '{s}')" for w, s in sorted(STEM_MAP.items()))
    return f"stems(w, s) AS MATERIALIZED (SELECT * FROM (VALUES {rows}))"


def _postings_ctes(min_ngram_df: int = 3) -> str:
    """CTE chain from `lin` to `post(doc_id, token, tf_idf)` — the full
    index-pipeline math (dedup, n-grams, stem merge, title bump, pruning,
    tf-idf)."""
    return f"""
{_stem_map_sql()},
kept AS MATERIALIZED (
  SELECT d, seq FROM (
    SELECT lin.d, lin.seq,
           row_number() OVER (PARTITION BY c.txt ORDER BY lin.seq) AS rn
    FROM lin JOIN conf c ON c.d = lin.d
  ) WHERE rn = 1
),
frag AS MATERIALIZED (
  SELECT k.seq, 0 AS fid,
         ['conf', 'doc', CAST(k.d AS VARCHAR)] AS ts
  FROM kept k
  UNION ALL
  SELECT k.seq, 1,
         list_filter(regexp_extract_all(c.txt, '[a-z0-9]+'),
                     t -> NOT regexp_full_match(t, '[0-9]{{5,}}')) AS ts
  FROM kept k JOIN conf c ON c.d = k.d
),
tok AS MATERIALIZED (
  SELECT seq, fid, unnest(ts) AS w, generate_subscripts(ts, 1) AS pos
  FROM frag
),
tokst AS MATERIALIZED (
  SELECT t.seq, t.fid, t.pos, t.w, coalesce(sm.s, t.w) AS ws,
         regexp_full_match(t.w, '[0-9]+') AS isnum
  FROM tok t LEFT JOIN stems sm ON sm.w = t.w
),
gr AS MATERIALIZED (
  SELECT seq, fid, w AS g, ws AS gs FROM tokst
  UNION ALL
  SELECT a.seq, a.fid, a.w || ' ' || b.w, a.ws || ' ' || b.ws
  FROM tokst a JOIN tokst b
    ON b.seq = a.seq AND b.fid = a.fid AND b.pos = a.pos + 1
  WHERE NOT (a.isnum AND b.isnum)
  UNION ALL
  SELECT a.seq, a.fid, a.w || ' ' || b.w || ' ' || c.w,
         a.ws || ' ' || b.ws || ' ' || c.ws
  FROM tokst a
  JOIN tokst b ON b.seq = a.seq AND b.fid = a.fid AND b.pos = a.pos + 1
  JOIN tokst c ON c.seq = a.seq AND c.fid = a.fid AND c.pos = a.pos + 2
  WHERE NOT (a.isnum AND b.isnum AND c.isnum)
),
rawtf AS MATERIALIZED (SELECT seq, g, count(*)::BIGINT AS tf FROM gr GROUP BY seq, g),
stemtf AS MATERIALIZED (SELECT seq, gs AS g, count(*)::BIGINT AS tf FROM gr GROUP BY seq, gs),
merged AS MATERIALIZED (
  SELECT seq, g, tf FROM rawtf
  UNION ALL
  SELECT s.seq, s.g, s.tf
  FROM stemtf s ANTI JOIN rawtf r ON r.seq = s.seq AND r.g = s.g
),
titleg AS MATERIALIZED (
  SELECT DISTINCT seq, g FROM (
    SELECT seq, g FROM gr WHERE fid = 0
    UNION ALL SELECT seq, gs FROM gr WHERE fid = 0
  )
),
bumped AS MATERIALIZED (
  SELECT m.seq, m.g, m.tf + CASE WHEN t.g IS NOT NULL THEN 99999 ELSE 0 END AS tf
  FROM merged m LEFT JOIN titleg t ON t.seq = m.seq AND t.g = m.g
),
dfs AS MATERIALIZED (SELECT g, count(*)::BIGINT AS df FROM bumped GROUP BY g),
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM kept),
post AS MATERIALIZED (
  SELECT b.seq AS doc_id, b.g AS token,
         floor((1.0 + ln(b.tf)) * ln(nn.n / dfs.df) * 1000.0 + 0.5) / 1000.0
           AS tf_idf
  FROM bumped b JOIN dfs ON dfs.g = b.g CROSS JOIN nn
  WHERE b.g NOT LIKE '% %' OR dfs.df >= {min_ngram_df}
)"""


INDEX_POSTINGS_SQL = (
    lineage_with()
    + ","
    + _postings_ctes()
    + """
SELECT token, doc_id, tf_idf FROM post
"""
)

# query "data stream merge": primary n-grams (n = 2) over raw + stemmed
# (start_search_engine.py:46-62); fallback = stemmed unigrams
SEARCH_QUERY = "data stream merge"
_PRIMARY = ["data stream", "stream merge", "stream merg"]
_FALLBACK = ["data", "stream", "merg"]
# page_context scans the flattened primary words in order; the LAST
# matching word wins (shared/webpage.py:55-65) — reversed CASE order here
_CTX_WORDS_LAST_WINS = ["merg", "stream", "merge", "data"]


def _tok_list(tokens) -> str:
    return "['" + "', '".join(tokens) + "']"


_SEARCH_CTES = f"""
prim AS MATERIALIZED (
  SELECT doc_id, CAST(floor(tf_idf * 1000.0 + 0.5) AS BIGINT) AS milli
  FROM post WHERE list_contains({_tok_list(_PRIMARY)}, token)
),
fall AS MATERIALIZED (
  SELECT doc_id, CAST(floor(tf_idf * 1000.0 + 0.5) AS BIGINT) AS milli
  FROM post WHERE list_contains({_tok_list(_FALLBACK)}, token)
),
sel AS MATERIALIZED (
  SELECT * FROM prim
  UNION ALL
  SELECT * FROM fall WHERE NOT EXISTS (SELECT 1 FROM prim)
),
ranked AS MATERIALIZED (
  SELECT doc_id, CAST(sum(milli) AS BIGINT) AS score_milli
  FROM sel GROUP BY doc_id
  ORDER BY score_milli DESC, doc_id ASC LIMIT 5
)"""


SEARCH_RESULTS_SQL = (
    lineage_with()
    + ","
    + _postings_ctes()
    + ","
    + _SEARCH_CTES
    + """
SELECT r.doc_id, r.score_milli, lin.url, 'conf doc ' || lin.d AS title
FROM ranked r JOIN lin ON lin.seq = r.doc_id
"""
)


def _ctx_case() -> str:
    whens = "\n    ".join(
        f"WHEN strpos(c.txt, '{w}') > 0 THEN substr(c.txt, strpos(c.txt, '{w}'), 300)"
        for w in _CTX_WORDS_LAST_WINS
    )
    return f"CASE {whens} ELSE '' END"


SEARCH_CONTEXTS_SQL = (
    lineage_with()
    + ","
    + _postings_ctes()
    + ","
    + _SEARCH_CTES
    + f"""
SELECT r.doc_id, lin.url, {_ctx_case()} AS context
FROM ranked r
JOIN lin ON lin.seq = r.doc_id
JOIN conf c ON c.d = lin.d
"""
)
