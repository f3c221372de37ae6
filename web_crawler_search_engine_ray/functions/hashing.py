"""Content hashing kernels: exact-dup polynomial hash, MinHash, SimHash.

- ``poly_hash`` reproduces the reference's 32-bit base-31 Horner hash over
  the space-joined page text (inverted_indexer/indexer/worker.py:124-142),
  vectorized with numpy uint32 wraparound arithmetic (exact same mod-2^32
  values, no per-character Python loop).
- MinHash / SimHash are beyond-reference training-data operators (SURVEY.md
  §2.8 A7 note): standard public constructions (Broder 1997 shingling +
  universal-hash permutations; Charikar 2002 simhash).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np

__all__ = [
    "poly_hash",
    "poly_hash_batch",
    "mix32_batch",
    "stable_text_digest",
    "shingle_hashes",
    "minhash_signature",
    "minhash_band_keys",
    "simhash64",
]

_M32 = np.uint64(1) << np.uint64(32)


def mix32_batch(k1: np.ndarray, k2: np.ndarray | int) -> np.ndarray:
    """Deterministic 32-bit mix of two non-negative integer keys.

    LCG multipliers with xor-shift avalanche, every step exactly
    reproducible in int64 SQL (no intermediate exceeds 2^63 for keys
    < 2^33, far above any key used here). The SQL replay lives in
    __ray_entry__._mix_sql."""
    h = (
        k1.astype(np.uint64) * np.uint64(1103515245)
        + np.asarray(k2, dtype=np.uint64) * np.uint64(12345)
    ) % _M32
    h ^= h >> np.uint64(16)
    h = (h * np.uint64(69069)) % _M32
    h ^= h >> np.uint64(13)
    h = (h * np.uint64(1103515245)) % _M32
    h ^= h >> np.uint64(16)
    return h

_POW31_CACHE = np.ones(1, dtype=np.uint32)


def _pow31(n: int) -> np.ndarray:
    """[31^0, 31^1, ... 31^(n-1)] mod 2^32, grown geometrically and cached."""
    global _POW31_CACHE
    if len(_POW31_CACHE) < n:
        size = max(n, 2 * len(_POW31_CACHE))
        out = np.empty(size, dtype=np.uint32)
        out[0] = 1
        np.multiply.accumulate(
            np.full(size - 1, 31, dtype=np.uint32), out=out[1:]
        )
        # accumulate over the constant array gives 31^1..31^(size-1)
        _POW31_CACHE = out
    return _POW31_CACHE[:n]


def poly_hash(text: str) -> int:
    """h = sum(ord(c_i) * 31^(n-1-i)) mod 2^32 — Horner base-31 page hash
    (indexer/worker.py:138-142), computed vectorized."""
    if not text:
        return 0
    # utf-32-le frombuffer yields the ord() of every char directly.
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    powers = _pow31(len(codes))[::-1]
    with np.errstate(over="ignore"):
        return int((codes * powers).sum(dtype=np.uint32))


def poly_hash_batch(texts: Sequence[str]) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.uint32)
    for i, t in enumerate(texts):
        out[i] = poly_hash(t)
    return out


def stable_text_digest(texts: Sequence[str]) -> List[bytes]:
    """128-bit blake2b digest per text — collision-free (for practical
    purposes) exact-dedup key where the 32-bit reference hash would collide."""
    return [hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest() for t in texts]


# --- MinHash -----------------------------------------------------------------

_MERSENNE_61 = np.uint64((1 << 61) - 1)


def shingle_hashes(tokens: Sequence[str], k: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of the k-token shingles of one document."""
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    hashes = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
            for s in set(joined)
        ),
        dtype=np.uint64,
    )
    return hashes


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingles: np.ndarray, num_perm: int = 128) -> np.ndarray:
    """MinHash signature (num_perm x uint64) via (a*x+b) mod Mersenne-61
    universal hashing, fully vectorized: one (num_perm, n) broadcast."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingles.astype(np.uint64) & _MERSENNE_61
    with np.errstate(over="ignore"):
        # (num_perm, 1) * (n,) -> (num_perm, n); uint64 wraparound is fine
        # for LSH purposes (we only need a deterministic permutation family).
        vals = (a[:, None] * x[None, :] + b[:, None]) & _MERSENNE_61
    return vals.min(axis=1)


def minhash_band_keys(signature: np.ndarray, num_bands: int = 16) -> List[bytes]:
    """LSH band keys: split the signature into num_bands rows-per-band chunks
    and digest each chunk; docs sharing any band key are candidates."""
    rows = len(signature) // num_bands
    return [
        hashlib.blake2b(signature[i * rows : (i + 1) * rows].tobytes(), digest_size=8).digest()
        for i in range(num_bands)
    ]


def simhash64(tokens: Sequence[str]) -> int:
    """Charikar simhash over token 64-bit hashes with tf weights."""
    if not tokens:
        return 0
    from collections import Counter

    counts = Counter(tokens)
    hashes = np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in counts
        ),
        dtype=np.uint64,
        count=len(counts),
    )
    weights = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    scores = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
    result = np.uint64(0)
    for bit_idx in np.nonzero(scores > 0)[0]:
        result |= np.uint64(1) << np.uint64(bit_idx)
    return int(result)
