"""Space-Saving / Misra-Gries heavy-hitter sketch (mergeable).

From the published algorithms (Misra & Gries 1982; Metwally et al.,
"Efficient Computation of Frequent and Top-k Elements in Data Streams",
2005): a bounded map of k counters; an unseen item evicts the minimum
counter and inherits its count (stored as the overestimation error).
Guarantees: any item with true count > N/k is present, and each
reported count overestimates by at most its recorded error.

Merging two sketches (Agarwal et al., "Mergeable Summaries", 2012):
sum counts/errors for shared keys, then re-prune to k counters adding
the evicted minimum into the survivors' error bound.  Partial sketches
per batch + one merge per key group == the same partial/merge shape as
the HLL and t-digest sketches — the scale path for top-k when exact
per-key aggregation (queries.top_users_by_type, oracle-checked) no
longer fits.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SpaceSaving"]


class SpaceSaving:
    def __init__(self, k: int = 64):
        self.k = int(k)
        self.counts: dict = {}
        self.errors: dict = {}

    def add_many(self, items, weights=None) -> "SpaceSaving":
        if weights is None:
            vals, cnts = np.unique(np.asarray(items), return_counts=True)
        else:
            import pandas as pd

            s = pd.Series(np.asarray(weights), index=np.asarray(items))
            g = s.groupby(level=0).sum()
            vals, cnts = g.index.to_numpy(), g.to_numpy()
        # process heaviest first so light items do the evicting
        order = np.argsort(-cnts, kind="stable")
        for v, c in zip(vals[order], cnts[order]):
            self._add(v, float(c))
        return self

    def _add(self, item, count: float) -> None:
        if item in self.counts:
            self.counts[item] += count
            return
        if len(self.counts) < self.k:
            self.counts[item] = count
            self.errors[item] = 0.0
            return
        # evict the minimum counter (Space-Saving)
        m_item = min(self.counts, key=self.counts.get)
        m_count = self.counts.pop(m_item)
        self.errors.pop(m_item)
        self.counts[item] = m_count + count
        self.errors[item] = m_count

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        for item, c in other.counts.items():
            if item in self.counts:
                self.counts[item] += c
                self.errors[item] += other.errors[item]
            else:
                self.counts[item] = c
                self.errors[item] = other.errors[item]
        if len(self.counts) > self.k:
            ranked = sorted(self.counts, key=self.counts.get, reverse=True)
            evicted_max = max(self.counts[i] for i in ranked[self.k:])
            keep = ranked[:self.k]
            self.counts = {i: self.counts[i] for i in keep}
            # a dropped counter's mass may belong to any survivor-range
            # item: fold it into the error bound (mergeable-summaries
            # pruning rule)
            self.errors = {i: self.errors[i] + evicted_max for i in keep}
        return self

    def top(self, n: int) -> list[tuple[object, float, float]]:
        """[(item, count_upper_bound, error)] for the n largest."""
        ranked = sorted(self.counts, key=self.counts.get, reverse=True)[:n]
        return [(i, self.counts[i], self.errors[i]) for i in ranked]

    # ---------------------------------------------------------- serde

    def to_items(self) -> list[tuple[object, float, float]]:
        return [(i, self.counts[i], self.errors[i]) for i in self.counts]

    @classmethod
    def from_items(cls, k: int, items) -> "SpaceSaving":
        ss = cls(k)
        for i, c, e in items:
            ss.counts[i] = c
            ss.errors[i] = e
        return ss
