"""Deduplication operators for training-data pipelines.

Exact dedup lives in queries.py (hash-partitioned group-by + min).  This
module adds the near-dup family, Ray-Data-first:

- **MinHash + LSH** (Broder 1997; Leskovec et al., MMDS ch.3): per batch,
  shingle each doc into word k-grams, compute ``num_perm`` minhashes with
  the universal-hash trick ((a·x + b) mod p), emit one
  (band_id, band_hash, doc_id) row per LSH band (flat explode), then
  ``groupby(band)`` produces candidate buckets; candidate pairs are
  verified with exact shingle Jaccard and clustered with min-label
  propagation (rounds of groupby-min), never a driver-side union-find
  over the full corpus.
- **SimHash** (Charikar 2002): 64-bit signature from word-hash bit votes;
  pairs within Hamming distance ``d`` found by the pigeonhole LSH on
  4 bands of 16 bits.
- **Embedding cosine near-dup**: random-hyperplane LSH buckets then
  exact cosine verification inside buckets (broadcast-free: buckets are
  the shuffle key).

All hashing is deterministic across processes (crc32/FNV, fixed seeds) —
a Ray requirement the stdlib ``hash()`` violates (PYTHONHASHSEED).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "word_hashes",
    "shingle_set",
    "MinHasher",
    "minhash_bands",
    "lsh_candidate_pairs",
    "verify_jaccard_pairs",
    "cluster_pairs",
    "minhash_dedup",
    "SimHasher",
    "simhash_pairs",
    "embedding_neardup",
]

_WORD_RE = re.compile(r"[\w']+")
_MERSENNE = np.uint64((1 << 61) - 1)


def word_hashes(words: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per word (crc32 high/low mix)."""
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        b = w.encode("utf-8", "ignore")
        out[i] = (np.uint64(zlib.crc32(b)) << np.uint64(32)) | np.uint64(
            zlib.crc32(b, 0xFEEDFACE)
        )
    return out


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-gram hashes of a document."""
    words = [w.lower() for w in _WORD_RE.findall(text or "")]
    if len(words) < k:
        ws = word_hashes(words)
        return np.unique(ws) if len(ws) else np.array([], dtype=np.uint64)
    hs = word_hashes(words)
    base = np.uint64(1099511628211)
    powers = np.array([base ** np.uint64(i) for i in range(k)],
                      dtype=np.uint64)[::-1]
    windows = np.lib.stride_tricks.sliding_window_view(hs, k)
    grams = (windows * powers).sum(axis=1, dtype=np.uint64)
    return np.unique(grams)


class MinHasher:
    """num_perm universal-hash minhashes; (a·x + b) mod 2^61-1 per perm,
    coefficients fixed by seed → identical signatures on every worker."""

    def __init__(self, num_perm: int = 128, seed: int = 42, k: int = 3):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if shingles.size == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingles.astype(np.uint64)[:, None]
        hashed = (x * self.a[None, :] + self.b[None, :]) % _MERSENNE
        return hashed.min(axis=0)


def minhash_bands(ds, num_perm: int = 128, bands: int = 32, k: int = 3,
                  seed: int = 42):
    """documents → exploded (band_id, band_hash, doc_id) rows."""
    rows_per_band = num_perm // bands

    class BandEmitter:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm, seed=seed, k=k)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            doc_ids, band_ids, band_hashes = [], [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                sig = self.mh.signature(shingle_set(text, k))
                for b in range(bands):
                    seg = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    h = zlib.crc32(seg.tobytes())
                    doc_ids.append(doc_id)
                    band_ids.append(b)
                    band_hashes.append(h)
            return pd.DataFrame(
                {"band_id": band_ids, "band_hash": band_hashes,
                 "doc_id": doc_ids}
            )

    from ..config import auto_concurrency

    return ds.map_batches(BandEmitter, batch_format="pandas", batch_size=2048,
                          concurrency=auto_concurrency(), num_cpus=1)


def lsh_candidate_pairs(band_rows, num_shuffle_buckets: int = 64):
    """LSH buckets → unordered candidate pairs (doc_a < doc_b).

    The exchange groups by ``hash(band) % B`` (B small) rather than one
    Ray group per LSH bucket — Ray pays Python overhead per group, so
    millions of tiny buckets are processed as B vectorized pandas
    groupbys instead (same bucketed-combine pattern as the rollup)."""

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["shard"] = (
            batch["band_id"].to_numpy() * 1_000_003 + batch["band_hash"].to_numpy()
        ) % num_shuffle_buckets
        return batch

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_bid, _bh), grp in g.groupby(["band_id", "band_hash"]):
            ids = sorted(set(grp["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        df = pd.DataFrame({"doc_a": out_a, "doc_b": out_b})
        # in-shard dedup of pairs surfaced by multiple bands
        return df.groupby(["doc_a", "doc_b"], as_index=False).size().rename(
            columns={"size": "n_bands"}
        )

    cand = band_rows.map_batches(add_shard, batch_format="pandas").groupby(
        "shard"
    ).map_groups(pairs, batch_format="pandas")
    # cross-shard dedup: a (band_id, band_hash) bucket lives in exactly one
    # shard, but the same PAIR can appear in buckets of different shards
    from ray.data.aggregate import Sum

    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        Sum("n_bands", alias_name="n_bands")
    )


def verify_jaccard_pairs(pairs_ds, docs_ds, threshold: float = 0.7, k: int = 3):
    """Exact shingle-Jaccard verification of candidate pairs.

    The candidate set is small relative to the corpus (LSH-pruned), so
    the texts for pair members are fetched via a broadcast dict of the
    candidate doc ids only (semi-join pattern: broadcast the needed key
    subset, not the corpus).
    """
    import ray

    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    needed = set(pairs["doc_a"]) | set(pairs["doc_b"])
    texts = (
        docs_ds.map_batches(
            lambda b: b[b["doc_id"].isin(needed)][["doc_id", "text"]],
            batch_format="pandas",
        )
        .to_pandas()
        .set_index("doc_id")["text"]
        .to_dict()
    )
    texts_ref = ray.put(texts)

    @ray.remote
    def verify(chunk: pd.DataFrame, ref):
        t = ref
        out = []
        for da, db in zip(chunk["doc_a"], chunk["doc_b"]):
            sa, sb = shingle_set(t.get(da, ""), k), shingle_set(t.get(db, ""), k)
            if sa.size == 0 or sb.size == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            jac = inter / (sa.size + sb.size - inter)
            if jac >= threshold:
                out.append((da, db, jac))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    chunks = np.array_split(pairs, max(1, len(pairs) // 2000))
    results = ray.get([verify.remote(c, texts_ref) for c in chunks])
    return pd.concat(results, ignore_index=True) if results else pd.DataFrame(
        {"doc_a": [], "doc_b": [], "jaccard": []}
    )


def cluster_pairs(verified: pd.DataFrame) -> pd.DataFrame:
    """Connected components over verified pairs → (doc_id, cluster_id).

    Min-label propagation; the verified pair set is the small output of
    LSH+verification, so a driver-side loop over edges is bounded.  (At
    full scale this becomes rounds of groupby-min over an edge Dataset —
    same algorithm, distributed carrier.)
    """
    label: dict = {}
    for da, db in zip(verified["doc_a"], verified["doc_b"]):
        label.setdefault(da, da)
        label.setdefault(db, db)

    def find(x):
        while label[x] != x:
            label[x] = label[label[x]]
            x = label[x]
        return x

    for da, db in zip(verified["doc_a"], verified["doc_b"]):
        ra, rb = find(da), find(db)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            label[hi] = lo
    rows = [(d, find(d)) for d in label]
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def minhash_dedup(docs_ds, num_perm: int = 128, bands: int = 32, k: int = 3,
                  threshold: float = 0.7, seed: int = 42) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline → (doc_id, cluster_id) for
    every doc in a near-dup cluster (singletons omitted)."""
    band_rows = minhash_bands(docs_ds, num_perm, bands, k, seed)
    cand = lsh_candidate_pairs(band_rows)
    verified = verify_jaccard_pairs(cand, docs_ds, threshold, k)
    return cluster_pairs(verified)


class SimHasher:
    """64-bit SimHash over word hashes."""

    def __init__(self):
        self.bit_masks = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def signature(self, text: str) -> int:
        words = [w.lower() for w in _WORD_RE.findall(text or "")]
        if not words:
            return 0
        hs = word_hashes(words)
        bits = (hs[:, None] & self.bit_masks[None, :]) != 0
        votes = bits.sum(axis=0) * 2 - len(hs)
        sig = np.uint64(0)
        for i in np.nonzero(votes > 0)[0]:
            sig |= self.bit_masks[i]
        return int(sig)


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash pigeonhole LSH: 4 bands of 16 bits —
    any pair within Hamming distance 3 shares at least one band."""

    class Emitter:
        def __init__(self):
            self.sh = SimHasher()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs = [self.sh.signature(t) for t in batch["text"]]
            rows = {"doc_id": [], "band_id": [], "band_val": [], "sig": []}
            for doc_id, sig in zip(batch["doc_id"], sigs):
                for b in range(4):
                    rows["doc_id"].append(doc_id)
                    rows["band_id"].append(b)
                    rows["band_val"].append((sig >> (16 * b)) & 0xFFFF)
                    rows["sig"].append(sig)
            return pd.DataFrame(rows)

    from ..config import auto_concurrency

    bands = docs_ds.map_batches(Emitter, batch_format="pandas",
                                batch_size=2048,
                                concurrency=auto_concurrency(), num_cpus=1)

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["shard"] = (
            batch["band_id"].to_numpy() * 1_000_003 + batch["band_val"].to_numpy()
        ) % 64
        return batch

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (_bid, _bv), grp in g.groupby(["band_id", "band_val"]):
            uniq = grp.drop_duplicates("doc_id")
            ids = uniq["doc_id"].tolist()
            sigs = uniq["sig"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ham = bin(int(sigs[i]) ^ int(sigs[j])).count("1")
                    if ham <= max_hamming:
                        a, b = sorted((ids[i], ids[j]))
                        out.append((a, b, ham))
        df = pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])
        return df.groupby(["doc_a", "doc_b"], as_index=False)["hamming"].min()

    cand = bands.map_batches(add_shard, batch_format="pandas").groupby(
        "shard"
    ).map_groups(pairs, batch_format="pandas")
    from ray.data.aggregate import Min

    return cand.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming")
    )


def embedding_neardup(emb_ds, threshold: float = 0.95, n_planes: int = 12,
                      seed: int = 42, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """Embedding-cosine near-dup: random-hyperplane LSH bucket (one
    shuffle) then exact cosine verification inside each bucket."""
    rng = np.random.default_rng(seed)
    planes_by_dim: dict[int, np.ndarray] = {}

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        dim = mat.shape[1]
        planes = planes_by_dim.get(dim)
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
            planes_by_dim[dim] = planes
        bits = (mat @ planes) > 0
        bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        return pd.DataFrame(
            {"vec_id": batch[id_col], "bucket": bucket,
             "vec": list(mat)}
        )

    buckets = emb_ds.map_batches(bucketize, batch_format="pandas",
                                 batch_size=4096)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(g["vec"].to_numpy())
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        ids = g["vec_id"].to_numpy()
        ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
        return pd.DataFrame(
            {"vec_a": ids[ii], "vec_b": ids[jj],
             "cos_sim": np.round(cos[ii, jj], 6)}
        )

    return buckets.groupby("bucket").map_groups(pairs, batch_format="pandas")
