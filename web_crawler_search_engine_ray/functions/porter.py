"""Porter stemmer — independent implementation of M.F. Porter's 1980
algorithm ("An algorithm for suffix stripping", Program 14(3)).

The reference uses nltk's PorterStemmer (shared/tokenizer.py:51,
start_search_engine.py:39); nltk is not available in this environment, so
this module implements the published algorithm directly. The engine and its
conformance oracle share THIS implementation, so index/search results are
self-consistent (nltk's NLTK_EXTENSIONS mode differs on a handful of words;
that divergence is documented, not hidden).

A per-process memo cache makes repeated stems O(1) — the token distribution
is Zipfian, so the cache hit rate in the tokenizer actor pool is high.
"""

from __future__ import annotations

__all__ = ["stem"]

_VOWELS = "aeiou"


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem_str: str) -> int:
    """m = number of VC sequences in the [C](VC){m}[V] decomposition."""
    m = 0
    prev_vowel = False
    for i in range(len(stem_str)):
        cons = _is_consonant(stem_str, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _contains_vowel(stem_str: str) -> bool:
    return any(not _is_consonant(stem_str, i) for i in range(len(stem_str)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o condition: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _step1a(w: str) -> str:
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ies"):
        return w[:-2]
    if w.endswith("ss"):
        return w
    if w.endswith("s"):
        return w[:-1]
    return w


def _step1b(w: str) -> str:
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            return w[:-1]
        return w
    flag = False
    if w.endswith("ed") and _contains_vowel(w[:-2]):
        w, flag = w[:-2], True
    elif w.endswith("ing") and _contains_vowel(w[:-3]):
        w, flag = w[:-3], True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            return w + "e"
        if _ends_double_consonant(w) and w[-1] not in "lsz":
            return w[:-1]
        if _measure(w) == 1 and _ends_cvc(w):
            return w + "e"
    return w


def _step1c(w: str) -> str:
    if w.endswith("y") and _contains_vowel(w[:-1]):
        return w[:-1] + "i"
    return w


_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
)

_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _rule_pass(w: str, rules, min_measure: int) -> str:
    for suffix, repl in rules:
        if w.endswith(suffix):
            stem_str = w[: -len(suffix)]
            if _measure(stem_str) > min_measure - 1:
                return stem_str + repl
            return w
    return w


def _step4(w: str) -> str:
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem_str = w[: -len(suffix)]
            if suffix == "ion" and not (stem_str and stem_str[-1] in "st"):
                return w
            if _measure(stem_str) > 1:
                return stem_str
            return w
    return w


def _step5a(w: str) -> str:
    if w.endswith("e"):
        stem_str = w[:-1]
        m = _measure(stem_str)
        if m > 1 or (m == 1 and not _ends_cvc(stem_str)):
            return stem_str
    return w


def _step5b(w: str) -> str:
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        return w[:-1]
    return w


_CACHE: dict[str, str] = {}
_CACHE_MAX = 1 << 20


def stem(word: str) -> str:
    """Stem one (already lowercased) token."""
    cached = _CACHE.get(word)
    if cached is not None:
        return cached
    w = word
    if len(w) > 2:
        w = _step1a(w)
        w = _step1b(w)
        w = _step1c(w)
        w = _rule_pass(w, _STEP2, 1)
        w = _rule_pass(w, _STEP3, 1)
        w = _step4(w)
        w = _step5a(w)
        w = _step5b(w)
    if len(_CACHE) < _CACHE_MAX:
        _CACHE[word] = w
    return w
