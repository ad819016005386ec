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
        # mergeable-summaries rule (Agarwal et al.): an item absent
        # from one side may have been evicted there, so its estimate
        # AND error inherit that side's eviction floor (the min
        # tracked count at capacity; 0 below capacity).  Adding 0
        # instead silently breaks the est >= true upper bound once an
        # item is pruned in one merge chain and re-enters from another
        # sketch — found at sf0.1 by the driver-style sweep via the
        # within_error_bound pin.
        off_s = (min(self.counts.values())
                 if len(self.counts) >= self.k else 0.0)
        off_o = (min(other.counts.values())
                 if len(other.counts) >= other.k else 0.0)
        counts, errors = {}, {}
        for item in set(self.counts) | set(other.counts):
            cs = self.counts.get(item)
            co = other.counts.get(item)
            counts[item] = ((cs if cs is not None else off_s)
                            + (co if co is not None else off_o))
            errors[item] = ((self.errors[item] if cs is not None
                             else off_s)
                            + (other.errors[item] if co is not None
                               else off_o))
        if len(counts) > self.k:
            # deterministic prune: ties broken by item repr; dropped
            # items stay bounded by the next merge's eviction floor
            # (min kept est >= every dropped est)
            keep = sorted(counts,
                          key=lambda i: (-counts[i], str(i)))[:self.k]
            counts = {i: counts[i] for i in keep}
            errors = {i: errors[i] for i in keep}
        self.counts, self.errors = counts, errors
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
