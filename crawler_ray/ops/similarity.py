"""Similarity search over the ``embeddings`` table.

- ``ann_topk``: exact brute-force cosine top-k — the correctness baseline.
  Query matrix broadcast once (ray.put), per-batch numpy matmul, per-batch
  partial top-k, tiny final merge. SQL oracle via double-precision dot in
  DuckDB (window rank).
- ``ann_lsh``: random-hyperplane LSH bucketed search — the scale path
  (touches only bucket+probe rows instead of the full corpus per query).
  Approximate: rows-only oracle; recall vs the exact baseline is asserted
  in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .common import pool_size

N_QUERIES = 8
TOP_K = 10
# 4 hyperplane bits + 1-bit probing scans ~5/16 of the corpus per query;
# on unclustered gaussian vectors expected recall ~0.45 (p = 1 - theta/pi
# per bit). More bits only pay off when the data actually clusters.
LSH_BITS = 4
LSH_PROBE_HAMMING = 1  # probe buckets within this Hamming distance


def _emb(sf_dir: str):
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc

    q = (
        _emb(sf_dir)
        .map_batches(lambda t: t.filter(pc.less(t["vec_id"], N_QUERIES)), batch_format="pyarrow")
        .to_pandas()
        .sort_values("vec_id")
    )
    m = np.stack(q["embedding"].to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return m, q["vec_id"].to_numpy()


def ann_topk(sf_dir: str):
    """Exact cosine top-10 neighbors for queries vec_id < 8 (self excluded).
    Output (query_id, rank, neighbor_id) — ints only for exact compare."""
    qm, qids = _query_matrix(sf_dir)
    ref = ray.put((qm, qids))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        m, ids = ray.get(ref)
        cand = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        cand /= np.linalg.norm(cand, axis=1, keepdims=True)
        sims = m @ cand.T  # (n_queries, n_batch)
        vids = df["vec_id"].to_numpy()
        rows = []
        k = min(TOP_K, sims.shape[1])
        for qi, q in enumerate(ids):
            s = sims[qi]
            # partial top-k within the batch; ties by vec_id asc
            order = np.lexsort((vids, -s))[: TOP_K + 1]
            for j in order:
                if vids[j] == q:
                    continue
                rows.append((int(q), float(s[j]), int(vids[j])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    partials = _emb(sf_dir).map_batches(partial_topk, batch_format="pandas", batch_size=4096)
    # final merge: tiny (n_queries * (k+1) per batch)
    df = partials.to_pandas()
    out = []
    for q, g in df.groupby("query_id"):
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out.append((int(q), rank, int(r["neighbor_id"])))
    return pd.DataFrame(out, columns=["query_id", "rank", "neighbor_id"]).astype("int64")


ANN_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), norms AS (
  SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM v GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, SUM(q.x*c.x) AS dot
  FROM v q JOIN v c ON q.i = c.i
  WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
  GROUP BY q.vec_id, c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id
         ) AS rank
  FROM dots
  JOIN norms nq ON nq.vec_id = query_id
  JOIN norms nc ON nc.vec_id = neighbor_id
)
SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= {TOP_K}
"""


class LshIndexStage:
    """Actor-pool stage: deterministic random hyperplanes built once per
    actor; assigns each vector its LSH bucket signature."""

    def __init__(self, dim: int = 64):
        rng = np.random.Generator(np.random.PCG64(987))
        self.planes = rng.standard_normal((LSH_BITS, dim))

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        return (bits * (1 << np.arange(LSH_BITS))).sum(axis=1).astype(np.int64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy())
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"],
                "bucket": self.bucket_of(mat),
                "embedding": df["embedding"],
            }
        )


def ann_lsh(sf_dir: str):
    """LSH-bucketed approximate top-k: only candidates whose bucket is
    within Hamming distance {LSH_PROBE_HAMMING} of the query bucket are
    scored. At 100 TB this is the path that avoids a full scan per query;
    here buckets are a column and probing is a vectorized mask."""
    qm, qids = _query_matrix(sf_dir)
    stage = LshIndexStage(dim=qm.shape[1])
    qbuckets = stage.bucket_of(qm)
    ref = ray.put((qm, qids, qbuckets))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        m, ids, qb = ray.get(ref)
        cand = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        cand /= np.linalg.norm(cand, axis=1, keepdims=True)
        cb = df["bucket"].to_numpy()
        vids = df["vec_id"].to_numpy()
        rows = []
        for qi, q in enumerate(ids):
            ham = np.array([bin(int(b) ^ int(qb[qi])).count("1") for b in cb])
            mask = (ham <= LSH_PROBE_HAMMING) & (vids != q)
            if not mask.any():
                continue
            s = m[qi] @ cand[mask].T
            mv = vids[mask]
            order = np.lexsort((mv, -s))[:TOP_K]
            for j in order:
                rows.append((int(q), float(s[j]), int(mv[j])))
        return pd.DataFrame(rows, columns=["query_id", "cos", "neighbor_id"])

    bucketed = _emb(sf_dir).map_batches(
        LshIndexStage, batch_format="pandas", batch_size=4096, concurrency=pool_size()
    )
    partials = bucketed.map_batches(probe, batch_format="pandas", batch_size=4096)
    df = partials.to_pandas()
    out = []
    for q, g in df.groupby("query_id"):
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        for rank, (_, r) in enumerate(g.iterrows(), start=1):
            out.append((int(q), rank, int(r["neighbor_id"])))
    return pd.DataFrame(out, columns=["query_id", "rank", "neighbor_id"]).astype("int64")


QUERIES = {
    "ann_topk": (ann_topk, ANN_TOPK_SQL),
    "ann_lsh": (ann_lsh, None),
}
