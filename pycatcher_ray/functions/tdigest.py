"""Merging t-digest — approximate quantiles with mergeable sketches.

From the published algorithm (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", 2019): centroids (mean, weight)
kept small by bounding each centroid's weight with the scale-function
limit ``4·n·δ⁻¹·q(1-q)`` (the k₁ bound's simpler weight form), which
concentrates resolution at the tails.  Serialization is two float64
arrays, so sketches ride through Arrow/Ray as plain binary columns and
merge associatively — the same partial/merge shape as the HLL sketch
(functions/hll.py) and the rollup partials.

The exact sharded quantile (queries.p95_hourly_by_source) is the
oracle-checked baseline; this sketch is the 10^9-key scale path where
gathering a series per key is no longer possible.
"""

from __future__ import annotations

import numpy as np

__all__ = ["TDigest"]


class TDigest:
    def __init__(self, compression: float = 100.0):
        self.compression = float(compression)
        self.means = np.array([], dtype=np.float64)
        self.weights = np.array([], dtype=np.float64)
        self._buf: list[np.ndarray] = []

    # ------------------------------------------------------------ build

    def add_many(self, values) -> "TDigest":
        arr = np.asarray(values, dtype=np.float64).ravel()
        arr = arr[~np.isnan(arr)]
        if arr.size:
            self._buf.append(arr)
            if sum(a.size for a in self._buf) > 8 * self.compression:
                self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if other.means.size:
            self._buf.append(other.means.copy())
            self._buf.append(other.weights.copy())
            # buffered as (means, weights) pair — flag via negative len
            self._buf[-2:] = [np.stack([other.means, other.weights])]
            self._compress()
        return self

    def _pending(self) -> tuple[np.ndarray, np.ndarray]:
        means = [self.means]
        weights = [self.weights]
        for a in self._buf:
            if a.ndim == 2:  # merged-in centroids (means, weights)
                means.append(a[0])
                weights.append(a[1])
            else:
                means.append(a)
                weights.append(np.ones(a.size))
        self._buf = []
        return np.concatenate(means), np.concatenate(weights)

    def _compress(self) -> None:
        m, w = self._pending()
        if m.size == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        n = w.sum()
        limit_scale = 4.0 * n / self.compression
        out_m, out_w = [], []
        cur_m, cur_w, acc = m[0], w[0], 0.0
        for i in range(1, m.size):
            q = (acc + cur_w / 2.0) / n
            if cur_w + w[i] <= limit_scale * q * (1.0 - q) + 1.0:
                tot = cur_w + w[i]
                cur_m += (m[i] - cur_m) * w[i] / tot
                cur_w = tot
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                acc += cur_w
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # ------------------------------------------------------------ query

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        n = self.weights.sum()
        target = q * n
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        idx = np.searchsorted(cum, target) - 1
        frac = (target - cum[idx]) / (cum[idx + 1] - cum[idx])
        return float(self.means[idx] + frac * (self.means[idx + 1] - self.means[idx]))

    # ---------------------------------------------------------- serde

    def to_bytes(self) -> bytes:
        self._compress()
        return (np.array([self.compression]).tobytes()
                + np.int64(self.means.size).tobytes()
                + self.means.tobytes() + self.weights.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        comp = np.frombuffer(blob[:8], dtype=np.float64)[0]
        k = int(np.frombuffer(blob[8:16], dtype=np.int64)[0])
        td = cls(comp)
        td.means = np.frombuffer(blob[16:16 + 8 * k], dtype=np.float64).copy()
        td.weights = np.frombuffer(blob[16 + 8 * k:16 + 16 * k],
                                   dtype=np.float64).copy()
        return td
