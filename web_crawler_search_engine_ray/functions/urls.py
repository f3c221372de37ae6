"""URL canonicalization, hashing and validity predicates (batch kernels).

Semantics re-derived from the reference (cited per function); all entry
points take/return sequences so stages can call them once per Arrow batch.
The stdlib ``urllib.parse`` functions are kept (reference parity: parsing
corner cases like params/fragments must match exactly), but everything is
structured batch-first: one compiled regex set per process, single pass per
batch, numpy boolean masks out.
"""

from __future__ import annotations

import re
from hashlib import sha256
from typing import Iterable, List, Sequence
from urllib.parse import parse_qs, unquote, urljoin, urlparse

import numpy as np

__all__ = [
    "normalize",
    "normalize_batch",
    "get_urlhash",
    "HASH_IMPL",
    "fnv1a64",
    "hash64_batch",
    "host_of",
    "host_batch",
    "is_valid_scheme",
    "is_valid_domain",
    "is_valid_path",
    "is_valid_query",
    "is_valid",
    "is_valid_batch",
    "resolve_links",
]


def normalize(url: str) -> str:
    """Canonicalize a URL.

    Reference semantics (web_crawler/utils/__init__.py:34-38): lowercase,
    percent-unquote, coerce http->https (str.replace, all occurrences), and
    strip ALL trailing slashes when the URL ends with one.
    """
    url = unquote(url.lower()).replace("http://", "https://")
    if url.endswith("/"):
        return url.rstrip("/")
    return url


def _as_string_array(urls):
    """Any str sequence / Arrow string array -> one combined pa.Array."""
    import pyarrow as pa

    if isinstance(urls, pa.ChunkedArray):
        return urls.combine_chunks()
    if isinstance(urls, pa.Array):
        return urls
    return pa.array(list(urls), type=pa.string())


def normalize_batch(urls: Sequence[str]) -> List[str]:
    """Batch normalize; fast path skips unquote when no '%'.

    Deliberately NOT an Arrow kernel chain: the C-level ``str`` methods
    (lower/replace/rstrip) run at ~3.7M urls/s here, ~4x FASTER than the
    equivalent pyarrow chain (ascii_lower + replace_substring + utf8_rtrim)
    once the list->Array->list round trip is paid — measured on a 200k-URL
    frontier batch. The parse-shaped kernels (is_valid_batch / host_batch)
    are where vectorization wins; property tests pin batch==scalar parity
    for all three (tests/test_functions.py)."""
    import pyarrow as pa

    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        urls = urls.to_pylist()
    out = []
    for u in urls:
        u = u.lower()
        if "%" in u:
            u = unquote(u)
        u = u.replace("http://", "https://")
        if u.endswith("/"):
            u = u.rstrip("/")
        out.append(u)
    return out


def get_urlhash(url: str) -> str:
    """sha256 hex of the URL sans scheme (web_crawler/utils/__init__.py:27-32)."""
    p = urlparse(url)
    return sha256(
        f"{p.netloc}/{p.path}/{p.params}/{p.query}/{p.fragment}".encode("utf-8")
    ).hexdigest()


# Identifies the URL/key hash implementation. Stamped into crawl checkpoint
# meta and the bucketed-doc-store manifest so state written under one hash
# function is never silently resumed/served under another (a seen-set shard
# key or store bucket id computed with a different hash would mis-route).
# Round-3 history: this used to ride polars' SEEDED xxhash ("stable within a
# polars version" only) — now a spec-pinned FNV-1a 64 that no dependency
# upgrade can move.
HASH_IMPL = "fnv1a64/1"

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64(s: str) -> int:
    """Scalar FNV-1a 64 reference (the spec for hash64_batch; test oracle)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash64_batch(urls: Sequence[str]) -> np.ndarray:
    """Stable 64-bit hash per URL (seen-set shard key + routing fingerprint).

    FNV-1a 64 over the utf-8 bytes — a published, dependency-free spec, so
    checkpointed seen-set shards and bucketed doc stores survive library
    upgrades (HASH_IMPL pins it in persisted-state metadata). Vectorized
    ACROSS rows: Arrow supplies the flat utf-8 buffer + offsets (no per-row
    encode), rows are ordered by descending length, and one numpy
    xor-multiply per byte POSITION updates the still-active prefix — total
    work is sum(len) vectorized element ops, no per-byte Python. None
    hashes as the empty string. uint64 arithmetic wraps mod 2^64 natively.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(urls)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        arr = pa.chunked_array([urls]).combine_chunks() if isinstance(
            urls, pa.ChunkedArray
        ) else urls
        arr = arr.cast(pa.large_string())
    else:
        arr = pa.array(list(urls), type=pa.large_string())
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    buf_offsets, buf_data = arr.buffers()[1], arr.buffers()[2]
    # slice-safety: a sliced array's logical offsets start arr.offset
    # ELEMENTS into the shared offsets buffer (the values already point
    # into the shared data buffer correctly)
    offsets = np.frombuffer(
        buf_offsets, dtype=np.int64, count=n + 1 + arr.offset
    )[arr.offset :]
    flat = (
        np.frombuffer(buf_data, dtype=np.uint8)
        if buf_data is not None
        else np.empty(0, np.uint8)
    )
    starts, lens = offsets[:-1], np.diff(offsets)
    order = np.argsort(-lens, kind="stable")
    ss, neg_sl = starts[order], -lens[order]
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    for j in range(int(-neg_sl[0]) if n else 0):
        k = int(np.searchsorted(neg_sl, -j, side="left"))  # rows with len > j
        if k == 0:
            break
        b = flat[ss[:k] + j].astype(np.uint64)
        h[:k] = (h[:k] ^ b) * _FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def host_of(url: str) -> str:
    return urlparse(url).netloc


# Printable-ASCII rows without space or brackets: urlsplit does no
# control-char stripping / IPv6-bracket validation / IDNA work on these, so
# one RFC-3986-appendix-B-style RE2 extract reproduces its component split
# exactly. Anything else falls back to stdlib urlparse row-by-row.
_SPLIT_SAFE_PAT = r"^[!-Z\\^-~]*$"
_SPLIT_PAT = (
    r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*):)?"
    r"(?://(?P<netloc>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?:.*))?$"
)


def _split_batch(arr):
    """(fast_mask, scheme, netloc, path, query) — Arrow arrays, one RE2
    extract over the batch. Component values on non-fast rows are
    untrusted; callers must re-derive those rows via stdlib urlparse."""
    import pyarrow.compute as pc

    fast = (
        pc.fill_null(pc.match_substring_regex(arr, _SPLIT_SAFE_PAT), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    ext = pc.extract_regex(pc.fill_null(arr, ""), _SPLIT_PAT)
    fast &= pc.is_valid(ext).to_numpy(zero_copy_only=False).astype(bool)
    f = {
        k: pc.fill_null(ext.field(k), "")
        for k in ("scheme", "netloc", "path", "query")
    }
    return fast, f["scheme"], f["netloc"], f["path"], f["query"]


def host_batch(urls: Sequence[str]) -> List[str]:
    """Vectorized ``urlparse(u).netloc`` (property-tested equal)."""
    arr = _as_string_array(urls)
    if len(arr) == 0:
        return []
    fast, _, netloc, _, _ = _split_batch(arr)
    out = netloc.to_pylist()
    if not fast.all():
        raw = arr.to_pylist()
        for i in np.nonzero(~fast)[0]:
            out[int(i)] = urlparse(raw[int(i)]).netloc
    return out


# --- validity predicates (web_crawler/utils/scraper.py:29-88) ---------------

_VALID_SCHEMES = frozenset({"http", "https"})

# Extension blacklist regex, reference scraper.py:57-65 (same alternation).
_EXT_BLACKLIST_RE = re.compile(
    r".*\.(css|js|bmp|gif|jpe?g|ico|java|rb|json|xml|yaml"
    r"|png|tiff?|mid|mp2|mp3|mp4|sql|c|cpp|py|js|sh|ts"
    r"|wav|avi|mov|mpeg|ram|m4v|mkv|ogg|ogv|pdf|bat|yml"
    r"|ps|eps|tex|ppt|pptx|doc|docx|xls|xlsx|names|ps1|scss|sass"
    r"|data|dat|exe|bz2|tar|msi|bin|7z|psd|dmg|iso|nb|swift"
    r"|epub|dll|cnf|tgz|sha1|ppsx|txt|war|r|z|data|jsx|tsx"
    r"|thmx|mso|arff|rtf|jar|csv|bib|odc|php|data-original"
    r"|rm|smil|wmv|swf|wma|zip|rar|gz)$"
)

_BANNED_QUERY_PARAMS = frozenset({"ical", "share", "action", "ucinetid", "image"})
_AFG_PARAM_RE = re.compile(r"afg\d+_page_id")
_QUERY_KEYWORDS = ("filter",)


def is_valid_scheme(scheme: str) -> bool:
    """scheme in {http, https} (scraper.py:29-32)."""
    return scheme in _VALID_SCHEMES


def is_valid_domain(domain: str, root_domains: Sequence[str]) -> bool:
    """netloc suffix-matches a configured root domain (scraper.py:34-38)."""
    return any(domain.endswith(rd) for rd in root_domains)


def is_valid_path(path: str) -> bool:
    """Trap detector (scraper.py:40-65): duplicate path segments, doku.php,
    or a blacklisted file extension -> invalid."""
    if not path:
        return True
    segments = path.strip("/").split("/")
    seg_set = set(segments)
    if len(segments) != len(seg_set):
        return False
    if "doku.php" in seg_set:
        return False
    return not _EXT_BLACKLIST_RE.match(path.lower())


def is_valid_query(query: str) -> bool:
    """Trap detector (scraper.py:67-77): banned params / afg\\d+_page_id /
    any param containing 'filter' -> invalid."""
    for param in parse_qs(query):
        if param in _BANNED_QUERY_PARAMS:
            return False
        if _AFG_PARAM_RE.match(param):
            return False
        if any(kw in param for kw in _QUERY_KEYWORDS):
            return False
    return True


def is_valid(url: str, root_domains: Sequence[str]) -> bool:
    """Conjunction of the four predicates over urlparse (scraper.py:79-88)."""
    p = urlparse(url)
    return (
        is_valid_scheme(p.scheme)
        and is_valid_domain(p.netloc, root_domains)
        and is_valid_path(p.path)
        and is_valid_query(p.query)
    )


# search-form of the anchored `.*\.(…)$` blacklist (same alternation)
_EXT_SEARCH_PAT = _EXT_BLACKLIST_RE.pattern[2:]
# a parsed query KEY can only contain a banned word / 'afg' / 'filter' if
# the raw query contains it as a substring ('+' only maps to space, which
# appears in no banned word) — UNLESS percent-encoding re-writes bytes, so
# '%' is risky too. Non-risky non-empty queries are valid without parse_qs.
_QUERY_RISKY_PAT = r"(ical|share|action|ucinetid|image|afg|filter|%)"
_DOKU_HASH: list = []  # lazy [np.uint64] cache


def is_valid_batch(urls: Sequence[str], root_domains: Sequence[str]) -> np.ndarray:
    """Boolean mask over a batch of URLs — exact ``is_valid`` semantics.

    Fast path (printable-ASCII rows, the crawl's steady state): ONE RE2
    component split for the whole batch (``_split_batch``), then Arrow
    kernels for the scheme / domain-suffix / extension-blacklist tests.
    The two row-wise trap predicates stay exact without a Python loop:

    - duplicate path segments: segments are flattened once, FNV-hashed
      (``hash64_batch``, vectorized), and equal-hash-within-row CANDIDATES
      found by one lexsort; only candidate rows (true dups + 2^-64
      collisions — hash equality is implied by string equality, so there
      are no false negatives) re-check via the scalar ``is_valid_path``.
    - banned query params: rows whose raw query lacks every banned
      substring and '%' cannot parse to a banned key (see
      ``_QUERY_RISKY_PAT``); only risky rows run stdlib ``parse_qs``.

    Non-ASCII / control-char / bracketed rows fall back to the stdlib
    chain row-by-row (urlsplit's strip/IDNA/IPv6 corner cases live there).
    Property-tested equal to per-row ``is_valid`` on adversarial corpora.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = _as_string_array(urls)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=bool)
    roots = tuple(root_domains)
    fast, scheme, netloc, path, query = _split_batch(arr)

    def _np(a):
        return a.to_numpy(zero_copy_only=False).astype(bool)

    ok_scheme = _np(
        pc.is_in(pc.ascii_lower(scheme), value_set=pa.array(sorted(_VALID_SCHEMES)))
    )
    ok_domain = np.zeros(n, dtype=bool)
    for rd in roots:
        ok_domain |= _np(pc.ends_with(netloc, rd))

    # params strip == urlparse._splitparams: drop ';…' iff the ';' sits in
    # the last path segment (leftmost ';[^/]*$' match is exactly that)
    path_nop = pc.replace_substring_regex(path, pattern=";[^/]*$", replacement="")
    ok_path = ~_np(
        pc.match_substring_regex(pc.ascii_lower(path_nop), _EXT_SEARCH_PAT)
    )
    segs = pc.split_pattern(pc.utf8_trim(path_nop, "/"), "/")
    lens = (
        pc.list_value_length(segs).to_numpy(zero_copy_only=False).astype(np.int64)
    )
    flat = segs.combine_chunks().flatten() if isinstance(
        segs, pa.ChunkedArray
    ) else segs.flatten()
    if len(flat):
        if not _DOKU_HASH:
            _DOKU_HASH.append(hash64_batch(["doku.php"])[0])
        h = hash64_batch(flat)
        rowid = np.repeat(np.arange(n, dtype=np.int64), lens)
        order = np.lexsort((h, rowid))
        hs, rs = h[order], rowid[order]
        adj = (rs[1:] == rs[:-1]) & (hs[1:] == hs[:-1])
        cand = np.union1d(rs[1:][adj], rowid[h == _DOKU_HASH[0]]).astype(np.int64)
        if len(cand):
            for i, pth in zip(
                cand, pc.take(path_nop, pa.array(cand)).to_pylist()
            ):
                ok_path[int(i)] = is_valid_path(pth)

    risky = _np(pc.match_substring_regex(query, _QUERY_RISKY_PAT))
    ok_query = ~risky
    ridx = np.nonzero(risky)[0]
    if len(ridx):
        for i, q in zip(
            ridx, pc.take(query, pa.array(ridx, pa.int64())).to_pylist()
        ):
            ok_query[int(i)] = is_valid_query(q)

    mask = ok_scheme & ok_domain & ok_path & ok_query
    if not fast.all():
        raw = arr.to_pylist()
        for i in np.nonzero(~fast)[0]:
            p = urlparse(raw[int(i)])
            mask[int(i)] = (
                p.scheme in _VALID_SCHEMES
                and any(p.netloc.endswith(rd) for rd in roots)
                and is_valid_path(p.path)
                and (not p.query or is_valid_query(p.query))
            )
    return mask


def resolve_links(base_url: str, hrefs: Iterable[str]) -> List[str]:
    """Absolutize hrefs against the fetched page URL and strip fragments.

    Reference semantics (scraper.py:25-27): ``urldefrag(urljoin(base, href))``.
    Fragment stripping is done by splitting on '#' (equivalent for already
    joined absolute URLs and cheaper than urldefrag's re-parse).
    """
    out = []
    for href in hrefs:
        u = urljoin(base_url, href)
        hash_pos = u.find("#")
        if hash_pos != -1:
            u = u[:hash_pos]
        out.append(u)
    return out
