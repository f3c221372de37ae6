"""Tokenizers and span-text extraction profiles (batch kernels).

Reference semantics, re-derived (NOT copied) from:
  - T1 char-scan tokenizer        shared/tokenizer.py:27-46
  - T2 word frequencies           shared/tokenizer.py:66-73
  - T3 n-gram tokenizer           shared/tokenizer.py:50-63
  - extraction profiles           shared/tokenizer.py:8-12 (posting),
                                  web_crawler/crawler/worker.py:91-93 (crawl),
                                  shared/webpage.py:27-29 (dedup/get_text)

The reference parses HTML with BeautifulSoup; the engine's input is the
pre-parsed ``spans`` column (see schema.py), so the three tag-blacklist
variants become three span-kind include sets. In span space the crawl and
dedup profiles coincide (both drop title + style/script/code); the posting
profile keeps title.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Iterable, List, Sequence, Tuple

from .porter import stem

__all__ = [
    "tokenize",
    "compute_word_frequencies",
    "tokenize_with_ngrams",
    "word_tokens",
    "query_tokens",
    "PROFILE_POSTING",
    "PROFILE_CONTEXT",
    "page_context",
    "PROFILE_CRAWL",
    "PROFILE_DEDUP",
    "extract_profile_text",
    "WS_RE",
]

# T1: maximal runs of ASCII alphanumerics, tokens lowercased afterwards.
# (Reference scans char-by-char testing char.encode('ascii').isalnum();
# the regex matches exactly those runs.)
_T1_RE = re.compile(r"[A-Za-z0-9]+")

# T3/T5 word pattern — note \b semantics differ from _T1_RE around '_' and
# unicode word chars; both are preserved independently (reference uses both).
_WORD_RE = re.compile(r"\b[a-zA-Z0-9]+\b")

WS_RE = re.compile(r"\s+")


def tokenize(text: str) -> List[str]:
    """T1: ASCII-alnum runs, lowercased (shared/tokenizer.py:27-46)."""
    return [t.lower() for t in _T1_RE.findall(text)]


def compute_word_frequencies(tokens: Iterable[str]) -> Dict[str, int]:
    """T2 (shared/tokenizer.py:66-73)."""
    freq: Dict[str, int] = {}
    for t in tokens:
        freq[t] = freq.get(t, 0) + 1
    return freq


def word_tokens(fragment: str, stem_tokens: bool = False) -> List[str]:
    """The T3/T5 per-fragment token rule: ``\\b[a-zA-Z0-9]+\\b`` matches,
    lowercased, numeric tokens longer than 4 digits dropped, optionally
    Porter-stemmed (shared/tokenizer.py:54-56)."""
    toks = [
        t.lower()
        for t in _WORD_RE.findall(fragment)
        if len(t) <= 4 or not t.isnumeric()
    ]
    if stem_tokens:
        toks = [stem(t) for t in toks]
    return toks


def append_grams(toks: List[str], grams: List[str]) -> None:
    """Append unigrams + 2/3-grams of one fragment's tokens to ``grams``
    (a gram is kept when at least one member is non-numeric); the numeric
    test is computed once per token, not once per window member."""
    grams.extend(toks)
    n_ = len(toks)
    if n_ < 2:
        return
    isnum = [t.isnumeric() for t in toks]
    ap = grams.append
    for i in range(n_ - 1):
        if not (isnum[i] and isnum[i + 1]):
            ap(toks[i] + " " + toks[i + 1])
    for i in range(n_ - 2):
        if not (isnum[i] and isnum[i + 1] and isnum[i + 2]):
            ap(toks[i] + " " + toks[i + 1] + " " + toks[i + 2])


def tokenize_with_ngrams(fragments: Sequence[str], stem_tokens: bool = False) -> Counter:
    """T3 (shared/tokenizer.py:50-63): per fragment emit unigrams plus 2- and
    3-grams (kept only when at least one gram member is non-numeric);
    n-grams never cross fragment boundaries; count space-joined grams."""
    grams: List[str] = []
    for fragment in fragments:
        append_grams(word_tokens(fragment, stem_tokens), grams)
    return Counter(grams)


def tokenize_with_ngrams_both(fragments: Sequence[str]) -> Tuple[Counter, Counter]:
    """Raw and stemmed T3 counters in ONE tokenization pass (the stemmed
    fragment tokens are the memo-stemmed raw tokens — identical to
    word_tokens(fragment, True) since the numeric filter runs pre-stem)."""
    raw_grams: List[str] = []
    stem_grams: List[str] = []
    for fragment in fragments:
        toks = word_tokens(fragment)
        append_grams(toks, raw_grams)
        append_grams([stem(t) for t in toks], stem_grams)
    return Counter(raw_grams), Counter(stem_grams)


def query_tokens(query: str) -> Tuple[List[str], List[str]]:
    """T5 (start_search_engine.py:46-62): returns (primary, fallback) token
    lists. Primary = n-grams with n = clamp(len(tokens)-1, 1, 3) over raw
    tokens plus stemmed n-grams not already present; fallback = stemmed
    unigrams (start_search_engine.py:38-43)."""
    raw = [
        t.lower()
        for t in _WORD_RE.findall(query)
        if not t.isnumeric() or len(t) <= 4
    ]
    stemmed = [stem(t) for t in raw]
    n = min(max(1, len(raw) - 1), 3)

    def ngrams(tokens: List[str]) -> List[Tuple[str, ...]]:
        return [tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]

    primary_tuples = ngrams(raw)
    primary_tuples += [g for g in ngrams(stemmed) if g not in primary_tuples]
    primary = [" ".join(g) for g in primary_tuples]
    return primary, stemmed


# --- span extraction profiles ------------------------------------------------

# Span kinds carrying indexable text in each profile. 'image' text is alt
# text (not page text in any reference profile); 'link' text is anchor text
# (part of soup text in all profiles).
_TEXT_KINDS = ("text", "h1", "h2", "h3", "strong", "link")

# Posting extraction keeps <title> text (shared/tokenizer.py:11 drops only
# style/code/script/[document]).
PROFILE_POSTING = frozenset(_TEXT_KINDS + ("title",))
# Crawl-side frequency extraction drops head/title/td/tr too
# (web_crawler/crawler/worker.py:92).
PROFILE_CRAWL = frozenset(_TEXT_KINDS)
# get_text (dedup hash + search context) drops head (incl. title)
# (shared/webpage.py:28) — coincides with PROFILE_CRAWL in span space.
PROFILE_DEDUP = frozenset(_TEXT_KINDS)
# get_context reads raw <body> stripped strings WITHOUT decomposing
# style/script/code (shared/webpage.py:55-60 quirk — no decompose call on
# that path), so those kinds stay in the context profile.
PROFILE_CONTEXT = frozenset(_TEXT_KINDS + ("script", "style", "code"))


def extract_profile_text(
    kinds: Sequence[str], texts: Sequence[str], profile: frozenset
) -> List[str]:
    """Return whitespace-normalized non-empty fragments of one document's
    spans filtered to a profile, in span order (extract_text semantics,
    shared/tokenizer.py:8-12)."""
    out = []
    for kind, text in zip(kinds, texts):
        if kind in profile and text:
            # stripped_strings yields pre-stripped fragments, then the
            # reference collapses internal whitespace.
            frag = text.strip()
            if frag:
                out.append(WS_RE.sub(" ", frag))
    return out


def page_context(
    kinds: Sequence[str], texts: Sequence[str], tokens: Sequence[str]
) -> str:
    """M16 search-result context window (shared/webpage.py:55-65): body
    word-text joined; for each query word the FIRST occurrence (lowercased
    find) sets a 300-char window — the loop does not break, so the LAST
    matching token wins; default ''. ``tokens`` may be space-joined n-grams
    (flattened to words, reference line 56)."""
    words: List[str] = []
    for frag in extract_profile_text(kinds, texts, PROFILE_CONTEXT):
        words.extend(_WORD_RE.findall(frag))
    joined = " ".join(words)
    low = joined.lower()
    context = ""
    for token in " ".join(tokens).split(" "):
        pos = low.find(token)
        if pos > -1:
            context = joined[pos : pos + 300]
    return context


# --- columnar (batch) profile kernels ----------------------------------------
#
# Arrow-native equivalents of the per-row span path above, used by the
# crawl-loop hot stages (stages/extract.analyze_batch, stages/index
# .add_page_hash). Semantics are bit-identical to sorting each page's spans
# by offset, extract_profile_text(), and T1 tokenize() — covered by the
# equivalence tests in tests/test_columnar_text.py.

import numpy as _np
import pyarrow as _pa
import pyarrow.compute as _pc

# Python re \s over str — spelled out for RE2 (whose bare \s is ASCII-only):
# ASCII whitespace + \x1c-\x1f + NEL + the Unicode space separators.
_PY_WS_CLASS = (
    "[\\t\\n\\x0b\\x0c\\r\\x1c-\\x1f "
    "\\x{85}\\x{a0}\\x{1680}\\x{2000}-\\x{200a}"
    "\\x{2028}\\x{2029}\\x{202f}\\x{205f}\\x{3000}]+"
)


def profile_joined_text_batch(spans_col, profile: frozenset) -> _pa.Array:
    """Per page: sort spans by offset, filter to ``profile`` kinds, strip +
    collapse whitespace, drop empties, join with ' ' — i.e. exactly
    ``' '.join(extract_profile_text(...))`` of the per-row path, computed
    with Arrow kernels (no per-span Python objects). Null/empty span lists
    yield ''."""
    sc = spans_col.combine_chunks() if isinstance(spans_col, _pa.ChunkedArray) else spans_col
    n = len(sc)
    if n == 0:
        return _pa.array([], _pa.string())
    lengths = _pc.fill_null(_pc.list_value_length(sc), 0).to_numpy(
        zero_copy_only=False
    ).astype(_np.int64)
    flat = sc.flatten()  # values of valid slots, concatenated in row order
    if len(flat) == 0:
        return _pa.array([""] * n, _pa.string())
    row_rep = _np.repeat(_np.arange(n, dtype=_np.int64), lengths)

    # stable (page, offset) order == per-page sorted(key=offset)
    offs = flat.field("offset").to_numpy(zero_copy_only=False)
    order = _np.lexsort((offs, row_rep))

    kinds_dict = _pc.dictionary_encode(flat.field("kind"))
    kind_vals = kinds_dict.dictionary.to_pylist()
    prof_codes = _np.array(
        [i for i, v in enumerate(kind_vals) if v in profile], dtype=_np.int64
    )
    codes = _pc.fill_null(kinds_dict.indices, -1).to_numpy(
        zero_copy_only=False
    ).astype(_np.int64)
    in_prof = _np.isin(codes[order], prof_codes)

    sel = order[in_prof]
    texts = _pc.take(flat.field("text"), _pa.array(sel, _pa.int64()))
    pages = row_rep[sel]

    norm = _pc.utf8_trim(
        _pc.replace_substring_regex(texts, pattern=_PY_WS_CLASS, replacement=" "),
        " ",
    )
    keep = _pc.fill_null(_pc.not_equal(norm, ""), False).to_numpy(
        zero_copy_only=False
    ).astype(bool)
    frags = norm.filter(_pa.array(keep))
    pages = pages[keep]

    counts = _np.bincount(pages, minlength=n)
    offsets = _np.concatenate(([0], _np.cumsum(counts)))
    lst = _pa.ListArray.from_arrays(
        _pa.array(offsets, _pa.int32()), frags.combine_chunks() if isinstance(frags, _pa.ChunkedArray) else frags
    )
    return _pc.binary_join(lst, " ")


# byte-level T1 machinery: [A-Za-z0-9]+ runs are pure-ASCII, and UTF-8
# continuation/lead bytes are all >= 0x80 — so a byte scan over the Arrow
# string buffer is exactly the reference's char scan, with A-Z lowered by
# table lookup.
_ALNUM_LUT = _np.zeros(256, dtype=bool)
for _c in range(256):
    _ALNUM_LUT[_c] = chr(_c).isascii() and chr(_c).isalnum()
_LOWER_LUT = _np.arange(256, dtype=_np.uint8)
_LOWER_LUT[ord("A") : ord("Z") + 1] += 32


def _t1_scan_strings(arr: _pa.Array):
    """Tokenize every string of ``arr`` (UTF-8) at byte level: returns
    (tokens: StringArray lowercased, owner: int64 array — index into
    ``arr`` of each token's source string). Tokens never cross string
    boundaries."""
    arr = arr.combine_chunks() if isinstance(arr, _pa.ChunkedArray) else arr
    n = len(arr)
    empty = (_pa.array([], _pa.string()), _np.empty(0, _np.int64))
    if n == 0:
        return empty
    bufs = arr.buffers()
    # offsets honor the array's slice offset; value buffer is shared
    off = _np.frombuffer(bufs[1], _np.int32)[arr.offset : arr.offset + n + 1]
    if bufs[2] is None:
        return empty
    data = _np.frombuffer(bufs[2], _np.uint8)
    start, end = int(off[0]), int(off[-1])
    if end == start:
        return empty
    b = data[start:end]
    po = (off.astype(_np.int64) - start)  # string starts, relative to b

    m = _ALNUM_LUT[b]
    # a token starts where alnum begins OR at a string boundary inside an
    # alnum run (adjacent strings in the buffer must not merge), and ends
    # where alnum stops or the next string begins — starts/ends pair up
    # 1:1 in order, so token lengths need no cumulative scan (numpy cumsum
    # is a serial scalar loop; on 40M+ bytes it dominated this kernel)
    boundary = _np.zeros(len(b) + 1, dtype=bool)
    boundary[po[:-1]] = True
    # start test, in-place over one scratch buffer: m & (~m<<1 | boundary)
    scratch = _np.empty_like(m)
    scratch[0] = False
    scratch[1:] = m[:-1]
    _np.logical_not(scratch, out=scratch)
    _np.logical_or(scratch, boundary[: len(b)], out=scratch)
    _np.logical_and(m, scratch, out=scratch)
    starts = _np.nonzero(scratch)[0]
    if not len(starts):
        return empty
    # end test: m & (~m>>1 | boundary-at-next)
    scratch[-1] = False
    scratch[:-1] = m[1:]
    _np.logical_not(scratch, out=scratch)
    _np.logical_or(scratch, boundary[1 : len(b) + 1], out=scratch)
    _np.logical_and(m, scratch, out=scratch)
    ends = _np.nonzero(scratch)[0] + 1
    tok_lens = ends - starts
    out_off = _np.concatenate(([0], _np.cumsum(tok_lens)))
    total = int(out_off[-1])
    idx = _np.arange(total, dtype=_np.int64) + _np.repeat(
        starts - out_off[:-1], tok_lens
    )
    tok_bytes = _LOWER_LUT[b[idx]]
    tokens = _pa.Array.from_buffers(
        _pa.utf8(),
        len(starts),
        [None, _pa.py_buffer(out_off.astype(_np.int32)), _pa.py_buffer(tok_bytes)],
    )
    owner = _np.searchsorted(po, starts, side="right") - 1
    return tokens, owner


def t1_token_page_counts(joined: _pa.Array):
    """T1 tokenize over a per-page joined-text array, vectorized: returns
    (page_ids, tokens, counts, page_lengths) where (page_ids[i], tokens[i])
    carries counts[i] occurrences and page_lengths[p] is page p's total
    token count. Token order within a page is unspecified (callers
    aggregate)."""
    n = len(joined)
    arr = joined.combine_chunks() if isinstance(joined, _pa.ChunkedArray) else joined
    toks, pages = _t1_scan_strings(_pc.fill_null(arr, ""))
    return _group_token_counts(toks, pages, n)


def t1_profile_page_counts(spans_col, profile: frozenset):
    """T1 token counts per page straight from the spans column. Whitespace
    normalization, fragment order and the joining separator are all
    invisible to T1 (any non-alnum char separates, tokens never cross
    fragments), so this skips the join entirely: filter span texts to the
    profile, byte-scan the flat text buffer, count. Returns the same tuple
    as t1_token_page_counts."""
    sc = (
        spans_col.combine_chunks()
        if isinstance(spans_col, _pa.ChunkedArray)
        else spans_col
    )
    n = len(sc)
    lengths = _pc.fill_null(_pc.list_value_length(sc), 0).to_numpy(
        zero_copy_only=False
    ).astype(_np.int64)
    flat = sc.flatten()
    if len(flat) == 0:
        return _group_token_counts(_pa.array([], _pa.string()), _np.empty(0, _np.int64), n)
    row_rep = _np.repeat(_np.arange(n, dtype=_np.int64), lengths)

    kinds_dict = _pc.dictionary_encode(flat.field("kind"))
    kind_vals = kinds_dict.dictionary.to_pylist()
    prof_codes = _np.array(
        [i for i, v in enumerate(kind_vals) if v in profile], dtype=_np.int64
    )
    codes = _pc.fill_null(kinds_dict.indices, -1).to_numpy(
        zero_copy_only=False
    ).astype(_np.int64)
    text = flat.field("text")
    keep = _np.isin(codes, prof_codes) & _pc.is_valid(text).to_numpy(
        zero_copy_only=False
    ).astype(bool)

    frags = text.filter(_pa.array(keep))
    frag_pages = row_rep[keep]
    toks, owner = _t1_scan_strings(
        frags.combine_chunks() if isinstance(frags, _pa.ChunkedArray) else frags
    )
    return _group_token_counts(toks, frag_pages[owner] if len(owner) else owner, n)


def _group_token_counts(tokens: _pa.Array, pages: _np.ndarray, n: int):
    page_lengths = _np.bincount(pages, minlength=n)
    if len(pages) == 0:
        return (
            _np.empty(0, _np.int64),
            _pa.array([], _pa.string()),
            _np.empty(0, _np.int64),
            page_lengths,
        )
    grouped = (
        _pa.table({"page": _pa.array(pages, _pa.int64()), "token": tokens})
        .group_by(["page", "token"])
        .aggregate([("token", "count")])
        .sort_by("page")
    )
    return (
        grouped.column("page").to_numpy(zero_copy_only=False),
        grouped.column("token").combine_chunks(),
        grouped.column("token_count").to_numpy(zero_copy_only=False),
        page_lengths,
    )
