"""Similarity search over an embedding column (`embeddings` table).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(`ray.put`), each map_batches task does one numpy matmul against its batch and
emits per-batch local top-k; a final tiny groupby keeps the global top-k.
Scale path: LSH bucketing (random hyperplane signs) so each query only scans
matching buckets — same broadcast pattern, plus a bucket column to co-locate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.stack(col.to_numpy())


class BruteForceTopK:
    """Per-batch cosine scores vs a broadcast query matrix; emits local top-k
    rows (query_id, vec_id, sim) — global top-k finishes in a tiny sort."""

    def __init__(self, queries_ref, k: int = 5,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> None:
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q[0]
        qm = q[1].astype(np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pandas().to_numpy()
        m = _as_matrix(batch[self.vec_col].to_pandas()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = self.qm @ m.T  # (nq, nb)
        # mask self-matches BEFORE selection so the query's own row can't
        # occupy a top-k slot (its batch's (k+1)-th candidate would be lost)
        sims[ids[None, :] == self.qids[:, None]] = -np.inf
        nq, nb = sims.shape
        k = min(self.k, nb)
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        rows_q = np.repeat(self.qids, k)
        rows_v = ids[top.reshape(-1)]
        rows_s = np.take_along_axis(sims, top, axis=1).reshape(-1)
        keep = np.isfinite(rows_s)  # drop masked self rows
        # raw IEEE sims — the parity harness canon() quantizes; rounding here
        # (numpy banker's) vs SQL half-away would diverge at tie boundaries
        return pa.table({
            "query_id": pa.array(rows_q[keep]),
            "vec_id": pa.array(rows_v[keep]),
            "sim": pa.array(rows_s[keep]),
        })


def ann_topk(
    ds: "ray.data.Dataset", query_ids: list[int], k: int = 5,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> pd.DataFrame:
    """Global cosine top-k for each query id (queries drawn from the dataset).

    Returns a small pandas frame (query_id, vec_id, sim) — nq×k rows.
    """
    import pyarrow.compute as pc

    wanted = pa.array(list(query_ids))

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=wanted))

    qdf = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    qids = qdf[id_col].to_numpy()
    qm = _as_matrix(qdf[vec_col])
    ref = ray.put((qids, qm))
    local = ds.map_batches(
        BruteForceTopK, fn_constructor_kwargs={"queries_ref": ref, "k": k,
                                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8),
    ).to_pandas()
    out = (
        local.sort_values(["query_id", "sim", "vec_id"],
                          ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


class LSHBucketStage:
    """Scale path: random-hyperplane sign buckets as a column; co-locating on
    (bucket) turns ANN into per-bucket brute force. Hyperplanes broadcast."""

    def __init__(self, planes_ref, vec_col: str = "embedding") -> None:
        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = p
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[self.vec_col].to_pandas()).astype(np.float64)
        signs = (m @ self.planes.T) > 0  # (n, nbits)
        bucket = np.packbits(signs, axis=1, bitorder="little")[:, 0].astype(np.int32)
        return batch.append_column("lsh_bucket", pa.array(bucket, type=pa.int32()))


def make_planes(dim: int, nbits: int = 8, seed: int = 7) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((nbits, dim))


def kmeans_fit(x: np.ndarray, k: int, iters: int = 10, seed: int = 11
               ) -> np.ndarray:
    """Deterministic Lloyd's k-means (coarse quantizer for IVF)."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return cent


class IVFAssignStage:
    """Assign each vector to its nearest coarse centroid (broadcast) — the
    IVF inverted-list id as a column; partitioning on it co-locates lists."""

    def __init__(self, centroids_ref, vec_col: str = "embedding") -> None:
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) \
            else centroids_ref
        self.cent = c.astype(np.float64)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[self.vec_col].to_pandas()).astype(np.float64)
        d = ((m[:, None, :] - self.cent[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column(
            "ivf_list", pa.array(d.argmin(axis=1).astype(np.int32)))


def ivf_topk(
    ds: "ray.data.Dataset", query_ids: list[int], k: int = 5,
    nlist: int = 16, nprobe: int = 4, train_sample: int = 2048,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> pd.DataFrame:
    """IVF ANN: train a coarse quantizer on a sample, assign inverted-list
    ids, scan only each query's ``nprobe`` nearest lists.

    Scale shape: training happens once on a driver-side sample; centroids are
    broadcast; assignment is a map_batches matmul; at cluster scale partition
    on ``ivf_list`` so a query touches nprobe partitions.
    """
    import pyarrow.compute as pc

    sample = ds.limit(train_sample).to_pandas()
    x = _as_matrix(sample[vec_col]).astype(np.float64)
    cent = kmeans_fit(x, nlist)
    cent_ref = ray.put(cent)

    assigned = ds.map_batches(
        IVFAssignStage, fn_constructor_kwargs={"centroids_ref": cent_ref,
                                               "vec_col": vec_col},
        batch_format="pyarrow", concurrency=(1, 8))

    wanted = pa.array(list(query_ids))
    qdf = ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=wanted)),
        batch_format="pyarrow").to_pandas()
    qm = _as_matrix(qdf[vec_col]).astype(np.float64)
    qd = ((qm[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probes = {qid: set(np.argsort(row)[:nprobe].tolist())
              for qid, row in zip(qdf[id_col], qd)}
    lists = pa.array(sorted({int(p) for s in probes.values() for p in s}),
                     type=pa.int32())

    cand = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_list"], value_set=lists)),
        batch_format="pyarrow").to_pandas()
    out_rows = []
    qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    for qi, qid in enumerate(qdf[id_col]):
        sub = cand[cand["ivf_list"].isin(probes[qid])]
        sub = sub[sub[id_col] != qid]
        if not len(sub):
            continue
        m = _as_matrix(sub[vec_col]).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ qnorm[qi]
        order = np.argsort(-sims, kind="stable")[:k]
        for j in order:
            out_rows.append((qid, int(sub[id_col].iloc[j]),
                             round(float(sims[j]), 6)))
    return pd.DataFrame(out_rows, columns=["query_id", "vec_id", "sim"])


def lsh_topk(
    ds: "ray.data.Dataset", query_ids: list[int], k: int = 5, nbits: int = 6,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> pd.DataFrame:
    """Scale-path ANN: search only the rows in each query's LSH bucket.

    Approximate (recall < 1 by design); the multi-probe refinement would also
    scan neighboring buckets. At cluster scale, bucket the dataset once
    (LSHBucketStage column + partition on it) and route each query to its
    bucket's partition instead of broadcasting the full query set.
    """
    import pyarrow.compute as pc

    wanted = pa.array(list(query_ids))

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=wanted))

    qdf = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    dim = len(qdf[vec_col].iloc[0])
    planes = make_planes(dim, nbits)
    planes_ref = ray.put(planes)

    bucketed = ds.map_batches(
        LSHBucketStage, fn_constructor_kwargs={"planes_ref": planes_ref,
                                               "vec_col": vec_col},
        batch_format="pyarrow", concurrency=(1, 8))

    qm = _as_matrix(qdf[vec_col]).astype(np.float64)
    qsign = (qm @ planes.T) > 0
    qbucket = np.packbits(qsign, axis=1, bitorder="little")[:, 0].astype(np.int32)
    # multi-probe: each query scans its own bucket plus all buckets at
    # hamming distance 1 (flip one hyperplane sign) — the standard recall
    # lever that keeps the scanned fraction at (nbits+1)/2^nbits
    probes = {
        qid: {int(b)} | {int(b) ^ (1 << i) for i in range(nbits)}
        for qid, b in zip(qdf[id_col], qbucket)
    }
    buckets = pa.array(sorted({b for s in probes.values() for b in s}))

    def in_buckets(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["lsh_bucket"], value_set=buckets))

    cand = bucketed.map_batches(in_buckets, batch_format="pyarrow").to_pandas()
    out_rows = []
    qnorm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    for qi, qid in enumerate(qdf[id_col]):
        sub = cand[cand["lsh_bucket"].isin(probes[qid])]
        sub = sub[sub[id_col] != qid]
        if not len(sub):
            continue
        m = _as_matrix(sub[vec_col]).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ qnorm[qi]
        order = np.argsort(-sims, kind="stable")[:k]
        for j in order:
            out_rows.append((qid, int(sub[id_col].iloc[j]),
                             round(float(sims[j]), 6)))
    return pd.DataFrame(out_rows, columns=["query_id", "vec_id", "sim"])
