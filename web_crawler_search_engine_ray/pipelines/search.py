"""Query serving over the columnar index (start_search_engine.py:13-115).

The reference's byte-seek text files (index_of_index / index_of_crawled)
are replaced by Parquet predicate pushdown: postings are read with a
``token IN (...)`` filter (a semi-join, SURVEY.md J3) and the tiny result
is aggregated driver-side — the reference's own query path is
single-process too (§3.3). The catalog is loaded once (small).

Divergence kept deliberately: the reference's ``index_of_index.get(token)``
treats a token stored at byte offset 0 as missing (falsy-offset bug,
start_search_engine.py:92); exact token matching has no such artifact.
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..functions.text import query_tokens


class SearchService:
    def __init__(self, postings_path: str, catalog_path: str):
        self.postings = pads.dataset(postings_path, format="parquet")
        cat = pads.dataset(catalog_path, format="parquet").to_table()
        self.catalog = {
            r["doc_id"]: (r["url"], r["title"]) for r in cat.to_pylist()
        }

    def _lookup(self, tokens: List[str]) -> pa.Table:
        return self.postings.to_table(
            filter=pc.field("token").isin(pa.array(tokens, pa.string()))
        )

    def search(self, query: str, k: int = 5) -> List[Tuple[int, float, str, str]]:
        """Top-k (doc_id, score, url, title); falls back to stemmed
        unigrams when the n-gram pass finds nothing
        (start_search_engine.py:38-43)."""
        primary, fallback = query_tokens(query)
        results = self._run(primary, k)
        if not results:
            results = self._run(fallback, k)
        return results

    def _run(self, tokens: List[str], k: int) -> List[Tuple[int, float, str, str]]:
        if not tokens:
            return []
        tbl = self._lookup(tokens)
        if tbl.num_rows == 0:
            return []
        df = tbl.to_pandas()
        # A6: group postings by doc, sum tf_idf (start_search_engine.py:99-115)
        scores = df.groupby("doc_id")["tf_idf"].sum()
        ranked = scores.sort_values(ascending=False, kind="stable")
        # deterministic tiebreak on doc_id (reference tie order is dict order)
        ranked = (
            pd.DataFrame({"doc_id": ranked.index, "score": ranked.values})
            .sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
            .head(k)
        )
        out = []
        for _, row in ranked.iterrows():
            doc_id = int(row["doc_id"])
            url, title = self.catalog.get(doc_id, ("", ""))
            out.append((doc_id, float(row["score"]), url, title))
        return out


class ResultPresenter:
    """Display-path operators over the crawled pages store
    (start_search_engine.py:117-151 display_results).

    - ``context``: M16 300-char query-context window (page_context kernel);
      pages are read with a ``url IN top_k`` predicate-pushdown filter —
      never a full scan.
    - ``summary``: M17 AI-summary is env-gated in the reference
      (shared/webpage.py:31-53, CLIENT None without an API key) and
      out-of-engine scope here: without a client it returns '' exactly like
      the reference's no-key path; no external calls are ever made.
    """

    def __init__(self, pages_path: str):
        self.pages = pads.dataset(pages_path, format="parquet")

    def contexts(self, urls: List[str], query_tokens_list: List[str]) -> dict:
        from ..functions.text import page_context

        tbl = self.pages.to_table(
            columns=["url", "spans"],
            filter=pc.field("url").isin(pa.array(urls, pa.string())),
        )
        out = {}
        for row in tbl.to_pylist():
            spans = sorted(row["spans"] or [], key=lambda s: s["offset"])
            out[row["url"]] = page_context(
                [s["kind"] for s in spans],
                [s["text"] for s in spans],
                query_tokens_list,
            )
        return out

    def summary_content(self, url: str) -> str:
        """M17 prompt construction (shared/webpage.py:37-40): body
        stripped-strings (the get_summary path does NOT decompose
        style/script/code — same quirk as get_context, so the CONTEXT
        profile), whitespace-collapsed, word-joined per fragment,
        fragments shorter than 5 chars dropped, newline-joined."""
        from ..functions.text import PROFILE_CONTEXT, _WORD_RE, extract_profile_text

        tbl = self.pages.to_table(
            columns=["url", "spans"],
            filter=pc.field("url") == url,
        )
        if tbl.num_rows == 0:
            return ""
        spans = sorted(tbl.column("spans")[0].as_py() or [], key=lambda s: s["offset"])
        frags = extract_profile_text(
            [s["kind"] for s in spans], [s["text"] for s in spans], PROFILE_CONTEXT
        )
        body_strings = [" ".join(_WORD_RE.findall(f)) for f in frags]
        return "\n".join(s for s in body_strings if len(s) >= 5)

    def summary(self, url: str, client=None):
        """M17 (shared/webpage.py:31-53). Without ``client`` returns ''
        exactly like the reference's no-API-key path (CLIENT is None) —
        no external call is ever made by default. With ``client`` — any
        callable(content: str) -> iterable[str chunks] (an injected LLM
        API adapter) — returns a generator that yields 'AI Summary: '
        then the streamed chunks, the reference's streaming shape."""
        if client is None:
            return ""

        def _stream():
            yield "AI Summary: "
            for chunk in client(self.summary_content(url)):
                if chunk is not None:
                    yield chunk

        return _stream()

    def summary_extractive(self, url: str, query_tokens: List[str], max_words: int = 30) -> str:
        """Offline deterministic substitute for the LLM call (no network
        in this engine's environment): lead-biased extract — fragments of
        the summary content that contain a query word, first-match order,
        clipped to ``max_words`` words. Not a reference behavior; an
        engine-native alternative surfaced behind an explicit flag."""
        content = self.summary_content(url)
        if not content:
            return ""
        wants = {w.lower() for t in query_tokens for w in t.split(" ")}
        picked: List[str] = []
        for frag in content.split("\n"):
            if not wants or wants.intersection(w.lower() for w in frag.split(" ")):
                picked.extend(frag.split(" "))
            if len(picked) >= max_words:
                break
        return " ".join(picked[:max_words])
