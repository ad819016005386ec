"""Approximate nearest-neighbor search over an embedding column.

Two paths (both over ``list<float>`` columns, float64 math):

- **Brute force** (baseline, exact): broadcast the normalized query
  matrix once, numpy matmul per Arrow batch, global top-k via
  sort+limit.  Used by ``queries.ann_topk``; right answer at any scale
  where a full scan is affordable.
- **IVF (inverted file)**: the scale path.  A small sampled k-means
  builds ``n_clusters`` coarse centroids (driver-side numpy on a
  bounded sample); every vector is assigned to its nearest centroid in
  a vectorized ``map_batches`` (broadcast centroids); a query then
  scans only the ``n_probe`` closest clusters — the partition-pruning
  analogue of IVF-Flat (Johnson, Douze & Jégou, "Billion-scale
  similarity search with GPUs", 2017).  The cluster id is the shuffle/
  partition key, so at scale each cluster is a parquet partition and a
  query touches n_probe partitions instead of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["kmeans_fit", "IVFIndex", "IVFDiskIndex", "build_ivf",
           "write_ivf", "load_ivf", "probe_clusters", "ivf_search",
           "ivf_search_disk", "brute_topk"]


def _to_matrix(emb_col) -> np.ndarray:
    if isinstance(emb_col, pa.ChunkedArray):
        emb_col = emb_col.combine_chunks()
    if hasattr(emb_col, "flatten"):  # plain list<float> arrays
        flat = emb_col.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64)
        return flat.reshape(len(emb_col), -1)
    # Ray ArrowTensorArray extension type (e.g. from_items of ndarrays)
    arr = emb_col.to_numpy(zero_copy_only=False)
    return np.asarray(arr, dtype=np.float64).reshape(len(emb_col), -1)


def kmeans_fit(sample: np.ndarray, n_clusters: int, n_iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Plain Lloyd k-means on a bounded sample (numpy, deterministic)."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    n_clusters = min(n_clusters, n)
    centroids = sample[rng.choice(n, n_clusters, replace=False)].copy()
    for _ in range(n_iters):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_clusters):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


class IVFIndex:
    """Driver-side handle: centroids + the cluster-assigned dataset."""

    def __init__(self, centroids: np.ndarray, assigned_ds, id_col: str,
                 vec_col: str):
        self.centroids = centroids
        self.ds = assigned_ds
        self.id_col = id_col
        self.vec_col = vec_col


def build_ivf(emb_ds, n_clusters: int = 16, sample_rows: int = 4096,
              id_col: str = "vec_id", vec_col: str = "embedding",
              seed: int = 42) -> IVFIndex:
    sample_df = emb_ds.random_sample(1.0, seed=seed).limit(sample_rows
                                                           ).to_pandas()
    sample = np.stack(sample_df[vec_col].to_numpy()).astype(np.float64)
    centroids = kmeans_fit(sample, n_clusters, seed=seed)

    def assign(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch[vec_col])
        d2 = (
            (mat * mat).sum(axis=1)[:, None]
            - 2.0 * mat @ centroids.T
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        cluster = d2.argmin(axis=1).astype(np.int64)
        return batch.append_column("cluster", pa.array(cluster))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return IVFIndex(centroids, assigned, id_col, vec_col)


class IVFDiskIndex:
    """Disk-backed IVF index: cluster-partitioned parquet + centroids.

    The cluster id IS the parquet partition (``cluster=<c>/`` dirs), so a
    search lists and reads ONLY the ``n_probe`` probed directories —
    pruning happens at the read, not as a filter over a full scan."""

    def __init__(self, path: str, centroids: np.ndarray, id_col: str,
                 vec_col: str):
        self.path = path
        self.centroids = centroids
        self.id_col = id_col
        self.vec_col = vec_col

    def cluster_dir(self, c: int) -> str:
        import os

        return os.path.join(self.path, "data", f"cluster={c}")


def write_ivf(index: IVFIndex, path: str) -> IVFDiskIndex:
    """Persist an IVF index as cluster-partitioned parquet."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    index.ds.write_parquet(os.path.join(path, "data"),
                           partition_cols=["cluster"])
    np.save(os.path.join(path, "centroids.npy"), index.centroids)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump({"id_col": index.id_col, "vec_col": index.vec_col,
                   "n_clusters": int(index.centroids.shape[0])}, f)
    return IVFDiskIndex(path, index.centroids, index.id_col, index.vec_col)


def load_ivf(path: str) -> IVFDiskIndex:
    import json
    import os

    meta = json.load(open(os.path.join(path, "meta.json")))
    centroids = np.load(os.path.join(path, "centroids.npy"))
    return IVFDiskIndex(path, centroids, meta["id_col"], meta["vec_col"])


def probe_clusters(centroids: np.ndarray, query: np.ndarray,
                   n_probe: int) -> list[int]:
    """The n_probe cluster ids nearest the query (L2 to centroids)."""
    q = np.asarray(query, dtype=np.float64)
    d2 = ((centroids - q[None, :]) ** 2).sum(axis=1)
    return sorted(int(c) for c in np.argsort(d2)[:n_probe])


def _topk_scorer(qn: np.ndarray, id_col: str, vec_col: str, k: int):
    """Per-batch cosine + top-k partial under (cos desc, id asc) — the
    final sort+limit then merges k×num_batches rows, not the corpus."""

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cos_sim": pa.array([], type=pa.float64())})
        mat = _to_matrix(batch[vec_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        cos = (mat @ qn) / norms
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(cos) > k:
            order = np.lexsort((ids, -cos))[:k]
        else:
            order = np.arange(len(cos))
        return pa.table({id_col: pa.array(ids[order]),
                         "cos_sim": pa.array(cos[order])})

    return score


def ivf_search(index: IVFIndex, query: np.ndarray, k: int = 10,
               n_probe: int = 4):
    """In-memory variant: filter the assigned dataset to the probed
    clusters, exact cosine inside; returns a Dataset of (id, cos_sim)
    top-k.  (The at-scale path is write_ivf + ivf_search_disk, where
    probing prunes at the READ instead of filtering a full scan.)"""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe_arr = pa.array(probe_clusters(index.centroids, q, n_probe),
                         type=pa.int64())
    id_col, vec_col = index.id_col, index.vec_col
    inner = _topk_scorer(qn, id_col, vec_col, k)

    def score(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return inner(
            batch.filter(pc.is_in(batch["cluster"], value_set=probe_arr))
        )

    scored = index.ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["cos_sim", id_col], descending=[True, False]).limit(k)


def ivf_search_disk(index: IVFDiskIndex, query: np.ndarray, k: int = 10,
                    n_probe: int = 4):
    """Disk variant: read ONLY the probed cluster partitions."""
    import os

    import ray.data as rd

    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    import glob

    files = [
        f
        for c in probe_clusters(index.centroids, q, n_probe)
        for f in sorted(glob.glob(os.path.join(index.cluster_dir(c),
                                               "*.parquet")))
    ]
    # (columns= with partitioning=None trips a Ray 2.49 bug; explicit
    # file paths don't trigger hive discovery, so columns alone is safe)
    ds = rd.read_parquet(files, columns=[index.id_col, index.vec_col])
    scored = ds.map_batches(
        _topk_scorer(qn, index.id_col, index.vec_col, k),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return scored.sort(["cos_sim", index.id_col],
                       descending=[True, False]).limit(k)


def brute_topk(emb_ds, query: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact baseline: broadcast query, matmul per batch, per-batch
    top-k partials, small final sort+limit."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    scored = emb_ds.map_batches(_topk_scorer(qn, id_col, vec_col, k),
                                batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["cos_sim", id_col], descending=[True, False]).limit(k)
