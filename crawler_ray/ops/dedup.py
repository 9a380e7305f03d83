"""Deduplication operators over ``documents`` / ``embeddings``:

- exact (content-hash groupby, first-doc-wins),
- char-n-gram Jaccard pair similarity (SQL-oracled on a bounded slice),
- MinHash + LSH banding near-dup candidates (scale path; rows-only oracle),
- SimHash fingerprints + near-pairs (rows-only oracle),
- embedding-cosine near-dup pairs (SQL-oracled via double-precision dot).

Scale shapes (ray_guide 'Aggregation at scale'): hashing/shingling is
per-batch vectorized work; the only shuffles are groupbys on hash keys
(band buckets, content hashes). Candidate verification happens inside the
band-bucket groups — never an all-pairs pass over the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from .common import bucketed_group_apply, pool_size

_MERSENNE = (1 << 61) - 1
N_HASHES = 64
N_BANDS = 16  # r = 4 rows/band
JACCARD_SLICE = 200  # doc_id bound for the SQL-oracled all-pairs slice
JACCARD_T = 300_000  # floor(1e6 * jaccard) threshold (0.3)


def _docs(sf_dir: str, columns=None):
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def dedup_exact(sf_dir: str):
    """Exact dedup: min doc_id + dup count per content hash."""

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fp", as_index=False).agg(
            doc_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )[["doc_id", "n_dups"]]

    return bucketed_group_apply(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(hash_batch, batch_format="pandas"),
        ["fp"],
        per_bucket,
    )


DEDUP_EXACT_SQL = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


def _char_grams(text: str, k: int = 3) -> set[str]:
    return {text[i : i + k] for i in range(len(text) - k + 1)}


def ngram_jaccard_pairs(sf_dir: str):
    """All-pairs 3-gram Jaccard over the bounded doc_id < 200 slice (the
    exhaustive baseline the LSH path approximates). Small side broadcast;
    emits (a, b, jac_e6) for floor(1e6*J) >= 300000."""
    import ray

    docs = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            lambda t: t.filter(pa.compute.less(t["doc_id"], JACCARD_SLICE)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    grams = {int(r.doc_id): _char_grams(r.text) for r in docs.itertuples()}
    ref = ray.put(grams)
    ids = sorted(grams)

    def pairs_for(batch: pd.DataFrame) -> pd.DataFrame:
        g = ray.get(ref)
        rows = []
        for a in batch["doc_id"]:
            ga = g[int(a)]
            for b in ids:
                if b <= a:
                    continue
                gb = g[b]
                inter = len(ga & gb)
                union = len(ga) + len(gb) - inter
                jac_e6 = int(np.floor(1_000_000.0 * inter / union)) if union else 0
                if jac_e6 >= JACCARD_T:
                    rows.append((int(a), int(b), jac_e6))
        return pd.DataFrame(rows, columns=["a", "b", "jac_e6"]).astype("int64")

    return rd.from_pandas(docs[["doc_id"]]).map_batches(
        pairs_for, batch_format="pandas", batch_size=32
    )


NGRAM_JACCARD_SQL = f"""
WITH g AS (
  SELECT DISTINCT doc_id, substr(text, i, 3) AS gram
  FROM (SELECT doc_id, text, unnest(range(1, length(text)-1)) AS i
        FROM documents WHERE doc_id < {JACCARD_SLICE})
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id
), inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT a, b,
       CAST(FLOOR(1000000.0 * i / (sa.n + sb.n - i)) AS BIGINT) AS jac_e6
FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
WHERE CAST(FLOOR(1000000.0 * i / (sa.n + sb.n - i)) AS BIGINT) >= {JACCARD_T}
"""


class MinHasher:
    """Actor-pool stage: seeded hash coefficients built once per actor."""

    def __init__(self):
        rng = np.random.Generator(np.random.PCG64(1234))
        self.a = rng.integers(1, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        n = max(1, len(text) - 4)
        hs = np.fromiter(
            (_md5_64(text[j : j + 5]) for j in range(n)), dtype=np.uint64, count=n
        )
        # (n_shingles, N_HASHES) deterministic hash family (a*x+b with uint64
        # wraparound then mod p; determinism is what matters, not universality)
        prods = (hs[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return prods.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in df["text"]])
        rows_per_band = N_HASHES // N_BANDS
        out = {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), N_BANDS),
            "band": np.tile(np.arange(N_BANDS, dtype=np.int32), len(df)),
        }
        bh = []
        for sig in sigs:
            for bnd in range(N_BANDS):
                chunk = sig[bnd * rows_per_band : (bnd + 1) * rows_per_band]
                bh.append(_md5_64(",".join(map(str, chunk))))
        out["band_hash"] = np.array(bh, dtype=np.uint64).astype(np.int64)
        return pd.DataFrame(out)


def minhash_lsh_candidates(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs: shingle->minhash->band rows ->
    groupby(band, band_hash) -> pairs within buckets (first-vs-rest).
    Output: distinct (a, b) candidate pairs. Rows-only oracle (the
    SQL-exact baseline is ngram_jaccard_pairs on the bounded slice)."""

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby(["band", "band_hash"]):
            ids = sorted(set(grp["doc_id"].astype("int64")))
            if len(ids) < 2:
                continue
            out_a += [ids[0]] * (len(ids) - 1)
            out_b += ids[1:]
        return pd.DataFrame({"a": out_a, "b": out_b}).astype("int64")

    sigs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher, batch_format="pandas", batch_size=512, concurrency=pool_size()
    )
    pairs = bucketed_group_apply(sigs, ["band", "band_hash"], pairs_per_bucket)

    def dedup_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).reset_index(drop=True)

    return bucketed_group_apply(pairs, ["a", "b"], dedup_per_bucket, n_buckets=16)


class SimHasher:
    """64-bit SimHash over word md5 hashes (actor-pool stage)."""

    def __init__(self):
        import re

        self.word = re.compile(r"[a-z]+")

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for w in self.word.findall(text.lower()):
            h = _md5_64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return v - (1 << 64) if v >= 1 << 63 else v

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": [self.simhash(t) for t in df["text"]],
            }
        )


def simhash_fingerprints(sf_dir: str):
    """Per-doc 64-bit SimHash (rows-only oracle: bit-level parity is checked
    by unit tests; SQL cannot express the word-hash accumulation)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher, batch_format="pandas", batch_size=512, concurrency=pool_size()
    )


def embedding_dup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs over vec_id < 300: brute-force
    double-precision cosine (numpy matmul against a broadcast matrix),
    emitting pairs with cos >= 0.25 (ints only: pair ids)."""
    import ray

    emb = (
        rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(pa.compute.less(t["vec_id"], 300)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    ref = ray.put((mat, ids))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        m, all_ids = ray.get(ref)
        idx = np.searchsorted(all_ids, df["vec_id"].to_numpy())
        sims = m[idx] @ m.T
        rows_a, rows_b = [], []
        for r, a in zip(sims, df["vec_id"].to_numpy()):
            hits = all_ids[(r >= 0.25) & (all_ids > a)]
            rows_a += [int(a)] * len(hits)
            rows_b += [int(x) for x in hits]
        return pd.DataFrame({"a": rows_a, "b": rows_b}).astype("int64")

    return rd.from_pandas(emb[["vec_id"]]).map_batches(
        pairs, batch_format="pandas", batch_size=64
    )


EMBEDDING_DUP_SQL = """
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings WHERE vec_id < 300
), norms AS (
  SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM v GROUP BY vec_id
), dots AS (
  SELECT p.vec_id AS a, q.vec_id AS b, SUM(p.x*q.x) AS dot
  FROM v p JOIN v q ON p.i = q.i AND p.vec_id < q.vec_id
  GROUP BY p.vec_id, q.vec_id
)
SELECT a, b FROM dots
JOIN norms na ON na.vec_id = a JOIN norms nb ON nb.vec_id = b
WHERE dot / (na.nrm * nb.nrm) >= 0.25
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "ngram_jaccard_pairs": (ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    "minhash_lsh_candidates": (minhash_lsh_candidates, None),
    "simhash_fingerprints": (simhash_fingerprints, None),
    "embedding_dup_pairs": (embedding_dup_pairs, EMBEDDING_DUP_SQL),
}
