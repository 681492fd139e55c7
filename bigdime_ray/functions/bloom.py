"""Vectorized Bloom filter (numpy bit array, double hashing).

Scale path for the referential check when the allowed catalog is too
large to broadcast as an exact value set (SURVEY.md §7.1 item 5): the
driver builds one filter from the catalog (~1.2 bytes/key at 1e-4 FP),
ships it via the broadcast ValidationContext, and membership tests are
vectorized over whole batches. Semantics: NOT-in-filter ⇒ definitely a
violation (no false negatives); in-filter ⇒ accepted, so violations can
be missed at the configured false-positive rate — an explicitly
documented ε, traded for O(bytes) instead of O(catalog) broadcast.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from bigdime_ray.functions.hashing import mix64

_GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


@dataclass
class BloomFilter:
    bits: np.ndarray          # uint64 words
    num_bits: int
    num_hashes: int

    @staticmethod
    def build(capacity: int, fp_rate: float = 1e-4) -> "BloomFilter":
        capacity = max(capacity, 1)
        m = int(-capacity * math.log(fp_rate) / (math.log(2) ** 2))
        m = max(64, (m + 63) // 64 * 64)
        k = max(1, round(m / capacity * math.log(2)))
        return BloomFilter(np.zeros(m // 64, dtype=np.uint64), m, k)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        h2 = mix64(h ^ _GOLD2) | np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                idx = (h + np.uint64(i) * h2) % np.uint64(self.num_bits)
                word = (idx >> np.uint64(6)).astype(np.int64)
                bit = np.uint64(1) << (idx & np.uint64(63))
                np.bitwise_or.at(self.bits, word, bit)

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        h = np.asarray(h, dtype=np.uint64)
        h2 = mix64(h ^ _GOLD2) | np.uint64(1)
        out = np.ones(len(h), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.num_hashes):
                idx = (h + np.uint64(i) * h2) % np.uint64(self.num_bits)
                word = (idx >> np.uint64(6)).astype(np.int64)
                bit = np.uint64(1) << (idx & np.uint64(63))
                out &= (self.bits[word] & bit) != 0
        return out

    @staticmethod
    def from_strings(values, fp_rate: float = 1e-4) -> "BloomFilter":
        import pyarrow as pa
        from bigdime_ray.functions.hashing import hash_string_column
        vals = list(values)
        bf = BloomFilter.build(len(vals), fp_rate)
        if vals:
            bf.add_hashes(hash_string_column(pa.array(vals, type=pa.string())))
        return bf
