"""Per-document posting/indexing kernels (pure; shared by the Ray tokenize
stage and the conformance oracle).

Semantics re-derived from Posting.get_postings (shared/posting.py:7-28),
WebPage.get_text/title (shared/webpage.py:22-29) and the indexer worker
(inverted_indexer/indexer/worker.py:124-166).
"""

from __future__ import annotations

from typing import Dict, List

from . import text as T

__all__ = ["doc_term_frequencies", "dedup_text", "page_title", "TAG_WEIGHTS"]

TAG_WEIGHTS = (
    ("title", 100000), ("h1", 10000), ("h2", 1000), ("h3", 100), ("strong", 10),
)


def doc_term_frequencies(spans: List[dict]) -> Dict[str, int]:
    """Posting.get_postings term-frequency map (shared/posting.py:7-28):
    unstemmed ∪ stemmed-first-wins n-gram counts over the posting profile,
    then per-tag-occurrence emphasis: every already-present token that also
    appears in the tag's own token set gains weight-1 (posting.py:17-25 —
    note the membership-only, add-don't-multiply quirk, SURVEY.md §7.6
    hazard 5)."""
    spans = sorted(spans, key=lambda s: s["offset"])
    kinds = [s["kind"] for s in spans]
    texts = [s["text"] for s in spans]
    frags = T.extract_profile_text(kinds, texts, T.PROFILE_POSTING)
    raw, stemmed = T.tokenize_with_ngrams_both(frags)
    freqs = dict(raw)
    for token, count in stemmed.items():
        if token not in freqs:
            freqs[token] = count
    for tag_kind, weight in TAG_WEIGHTS:
        for s in spans:
            if s["kind"] != tag_kind:
                continue
            # posting.py:23: the tag text becomes one space-joined lowercase
            # fragment, tokenized both ways; only membership matters.
            tag_string = " ".join(
                m.lower() for m in T._WORD_RE.findall(s["text"])
            )
            t_raw, t_stem = T.tokenize_with_ngrams_both([tag_string])
            tag_tokens = set(t_raw)
            tag_tokens.update(t_stem)
            bump = weight - 1
            # iterate the (small) tag set — same intersection as scanning
            # freqs, without touching every posting gram per tag span
            for token in tag_tokens:
                if token in freqs:
                    freqs[token] += bump
    return freqs


def dedup_text(spans: List[dict]) -> str:
    """get_text profile joined for the exact-dup polynomial hash
    (indexer/worker.py:125,144-166)."""
    spans = sorted(spans, key=lambda s: s["offset"])
    frags = T.extract_profile_text(
        [s["kind"] for s in spans], [s["text"] for s in spans], T.PROFILE_DEDUP
    )
    return " ".join(frags)


def page_title(spans: List[dict], url: str) -> str:
    """Last <title> text stripped, else the url (shared/webpage.py:22-25)."""
    titles = [
        s["text"] for s in sorted(spans, key=lambda s: s["offset"]) if s["kind"] == "title"
    ]
    return titles[-1].strip() if titles else url
