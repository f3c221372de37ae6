"""Equivalence tests: the columnar span kernels (functions/text) against
the per-row reference path they replace in the crawl hot stages.

The per-row path (sorted(spans, key=offset) → extract_profile_text → T1
tokenize / poly hash) IS the conformance-verified semantics; the columnar
kernels must match it exactly on arbitrary inputs, including unicode
whitespace, control characters, empty/whitespace-only fragments, null
texts and null span lists.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from web_crawler_search_engine_ray.functions import text as T
from web_crawler_search_engine_ray.functions.hashing import poly_hash_batch
from web_crawler_search_engine_ray.functions.postings import dedup_text
from web_crawler_search_engine_ray.schema import DOCS_SCHEMA

SPANS_TYPE = DOCS_SCHEMA.field("spans").type

KINDS = ["text", "title", "h1", "link", "script", "style", "code", "image"]

# texts drawn to hit the tricky classes: unicode spaces, controls, digits
TEXT_ALPHABET = st.sampled_from(
    list("abXY019 \t\n") + ["\x1c", "\xa0", " ", "é", "世", "-", "_"]
)
TEXT = st.text(alphabet=TEXT_ALPHABET, max_size=12)

SPAN = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(KINDS),
        "text": st.one_of(st.none(), TEXT),
        "media_ref": st.one_of(st.none(), st.text(max_size=4)),
        "offset": st.integers(min_value=0, max_value=7),  # collisions likely
    }
)
SPAN_LISTS = st.lists(st.one_of(st.none(), st.lists(SPAN, max_size=8)), max_size=12)


def _ref_joined(spans_py, profile):
    out = []
    for spans in spans_py:
        s2 = sorted(spans or [], key=lambda s: s["offset"])
        frags = T.extract_profile_text(
            [s["kind"] for s in s2],
            [s["text"] if s["text"] is not None else "" for s in s2],
            profile,
        )
        out.append(" ".join(frags))
    return out


def _ref_counts(spans_py, profile):
    return [
        T.compute_word_frequencies(T.tokenize(j))
        for j in _ref_joined(spans_py, profile)
    ]


@settings(max_examples=60, deadline=None)
@given(SPAN_LISTS)
def test_profile_joined_text_batch_equivalence(span_lists):
    arr = pa.array(span_lists, SPANS_TYPE)
    for profile in (T.PROFILE_DEDUP, T.PROFILE_POSTING, T.PROFILE_CONTEXT):
        got = T.profile_joined_text_batch(arr, profile).to_pylist()
        assert got == _ref_joined(arr.to_pylist(), profile)


@settings(max_examples=60, deadline=None)
@given(SPAN_LISTS)
def test_t1_profile_page_counts_equivalence(span_lists):
    arr = pa.array(span_lists, SPANS_TYPE)
    pages, toks, counts, lens = T.t1_profile_page_counts(arr, T.PROFILE_CRAWL)
    got = [dict() for _ in range(len(arr))]
    for p, tk, c in zip(pages, toks.to_pylist(), counts):
        got[p][tk] = int(c)
    ref = _ref_counts(arr.to_pylist(), T.PROFILE_CRAWL)
    assert got == ref
    assert [sum(f.values()) for f in ref] == list(lens)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), TEXT), max_size=12))
def test_t1_token_page_counts_equivalence(strings):
    arr = pa.array(strings, pa.string())
    pages, toks, counts, lens = T.t1_token_page_counts(arr)
    got = [dict() for _ in range(len(arr))]
    for p, tk, c in zip(pages, toks.to_pylist(), counts):
        got[p][tk] = int(c)
    ref = [T.compute_word_frequencies(T.tokenize(s or "")) for s in strings]
    assert got == ref


def test_add_page_hash_matches_per_row_dedup_text():
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    docs = generate_web(seed=3, num_hosts=4, num_docs=60)["docs"]
    from web_crawler_search_engine_ray.stages.index import add_page_hash

    batch = docs.rename_columns(
        ["url", "spans", "status", "content_bytes", "is_html"]
    )
    got = add_page_hash(batch).column("page_hash").to_pylist()
    ref = poly_hash_batch(
        [dedup_text(s or []) for s in docs.column("spans").to_pylist()]
    ).astype(np.int64)
    assert got == list(ref)


def test_sliced_chunked_inputs():
    """Kernels must honor Arrow slice offsets and chunked columns."""
    docs = None
    from web_crawler_search_engine_ray.sources.synthetic_web import generate_web

    docs = generate_web(seed=5, num_hosts=3, num_docs=40)["docs"]
    spans = docs.column("spans")
    sliced = docs.slice(7, 21).column("spans")
    chunked = pa.chunked_array(
        [spans.combine_chunks().slice(0, 10), spans.combine_chunks().slice(10)]
    )
    ref_all = _ref_joined(spans.to_pylist(), T.PROFILE_DEDUP)
    assert (
        T.profile_joined_text_batch(sliced, T.PROFILE_DEDUP).to_pylist()
        == ref_all[7:28]
    )
    assert T.profile_joined_text_batch(chunked, T.PROFILE_DEDUP).to_pylist() == ref_all
