"""HyperLogLog sketch, from scratch (Flajolet et al. 2007).

Mergeable approximate count-distinct for the partial/merge aggregation
shape (guide: "emit one serialized sketch per batch and merge them in a
second, tiny stage — sketches are designed to be mergeable").  Fixed
precision p → m = 2^p registers; standard bias-corrected estimator with
linear counting for the small range.  Deterministic (blake2b hashing)
so distributed runs reproduce exactly.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HLL"]


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if self.m >= 128:
            self.alpha = 0.7213 / (1.0 + 1.079 / self.m)
        elif self.m == 64:
            self.alpha = 0.709
        elif self.m == 32:
            self.alpha = 0.697
        else:
            self.alpha = 0.673

    @staticmethod
    def _hash64(values) -> np.ndarray:
        # blake2b 8-byte digests: two crc32 halves are linearly
        # correlated (CRC is linear), which wrecks the geometric rank
        # distribution and biases estimates ~+30%
        from hashlib import blake2b

        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            out[i] = int.from_bytes(
                blake2b(str(v).encode(), digest_size=8).digest(), "little"
            )
        return out

    def add_many(self, values) -> "HLL":
        h = self._hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of remaining bits + 1, vectorized via
        # bit_length: 64 - floor(log2(rest))
        bl = np.zeros(len(rest), dtype=np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            r[mask] >>= np.uint64(shift)
        rank = (64 - bl).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(blob, dtype=np.uint8).copy()
        return h

    def estimate(self) -> float:
        est = self.alpha * self.m * self.m / np.sum(
            np.power(2.0, -self.registers.astype(np.float64))
        )
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * self.m and zeros:
            return self.m * np.log(self.m / zeros)  # linear counting
        return float(est)
