"""MinHash / LSH / SimHash primitives — numpy-vectorized, process-stable.

All hashing is seeded and process-independent (crc32 / blake2, never
Python ``hash``), so signatures computed in different Ray workers and
in the driver-side oracle agree exactly.

Used by: stages/dedup_near.py (norm_name shingle LSH per SURVEY.md
§2.5), ops/dedup.py (document-level MinHash/SimHash near-dup), and
ops/similarity.py (LSH-bucketed ANN).
"""

from __future__ import annotations

import zlib
from functools import lru_cache

import numpy as np

_MERSENNE = (1 << 61) - 1


@lru_cache(maxsize=16)
def _coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    # cached: regenerating a RandomState per record was the dominant
    # cost of per-record signatures in hot map_batches loops
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def char_shingles(s: str, k: int = 3) -> list[str]:
    if len(s) < k:
        return [s] if s else []
    return [s[i:i + k] for i in range(len(s) - k + 1)]


def word_shingles(s: str, k: int = 3) -> list[str]:
    words = s.split()
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]


def shingle_ids(shingles: list[str]) -> np.ndarray:
    """Stable 32-bit ids for shingles (crc32: C speed, process-stable)."""
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(np.array(
        [zlib.crc32(s.encode()) for s in shingles], dtype=np.uint64))


def minhash_signature(ids: np.ndarray, num_perm: int = 64, seed: int = 7) -> np.ndarray:
    """(a*x + b) mod p universal-hash MinHash; empty set → all-max sentinel."""
    a, b = _coeffs(num_perm, seed)
    if ids.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    # outer product: num_perm × n_ids, min over ids
    vals = (np.multiply.outer(a, ids) + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Split a signature into bands; stable 64-bit key per band."""
    rows = len(sig) // bands
    keys = []
    for bi in range(bands):
        seg = sig[bi * rows:(bi + 1) * rows]
        keys.append((bi << 56) ^ (zlib.crc32(seg.tobytes()) << 16) ^
                    zlib.crc32(seg[::-1].tobytes()))
    return keys


def minhash_jaccard(sig1: np.ndarray, sig2: np.ndarray) -> float:
    return float(np.mean(sig1 == sig2))


def token_ids_md5(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit ids: first 8 bytes of md5, big-endian — chosen so a
    SQL oracle can reproduce them exactly (DuckDB:
    ``('0x' || substr(md5(w), 1, 16))::UBIGINT``). Deduped like
    shingle_ids."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    import hashlib

    return np.unique(np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
         for t in tokens], dtype=np.uint64))


def simhash64(token_ids: np.ndarray, weights: np.ndarray | None = None,
              mix: bool = True) -> int:
    """64-bit SimHash over stable token ids. ``mix=False`` skips the
    splitmix64 expansion — for ids that are already uniform 64-bit
    (token_ids_md5), keeping the sketch SQL-reproducible."""
    if token_ids.size == 0:
        return 0
    x = token_ids.astype(np.uint64)
    if mix:
        # expand each 32-bit crc to 64 bits (splitmix64)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    bits = ((x[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    w = weights[:, None] if weights is not None else 1
    acc = (bits * 2 - 1) * w
    vec = acc.sum(axis=0)
    return int(((vec > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0
