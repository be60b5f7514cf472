"""Simple Bloom filter for repeat k-mer masking.

Counterpart of the btllib Bloom filter the reference's ``read_minimizers``
optionally consults to drop repeat minimizers (``ntjoin_utils.py:182``): a
minimizer whose k-mer sequence is in the repeat filter is treated like a
duplicate and removed from the assembly's sketch.
"""
from __future__ import annotations

import numpy as np


class BloomFilter:
    def __init__(self, size_bits: int = 1 << 24, num_hashes: int = 3):
        self.size = int(size_bits)
        self.num_hashes = num_hashes
        self.bits = np.zeros((self.size + 63) // 64, dtype=np.uint64)

    def _indices(self, item: str | bytes):
        if isinstance(item, str):
            item = item.encode()
        h1 = hash(item) & 0xFFFFFFFFFFFFFFFF
        h2 = hash(item[::-1] + b"\x01") & 0xFFFFFFFFFFFFFFFF
        for i in range(self.num_hashes):
            yield (h1 + i * h2) % self.size

    def insert(self, item: str | bytes) -> None:
        for idx in self._indices(item):
            self.bits[idx >> 6] |= np.uint64(1 << (idx & 63))

    def contains(self, item: str | bytes) -> bool:
        return all(
            self.bits[idx >> 6] & np.uint64(1 << (idx & 63))
            for idx in self._indices(item)
        )
