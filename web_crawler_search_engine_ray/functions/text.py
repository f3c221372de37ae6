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
