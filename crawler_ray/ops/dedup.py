"""Deduplication operators over ``documents`` / ``embeddings``:

- exact (content-hash groupby, first-doc-wins),
- char-n-gram Jaccard pair similarity (SQL-oracled on a bounded slice),
- MinHash + LSH banding near-dup candidates (scale path; rows-only driver
  oracle + a banding-theory recall floor asserted in tests),
- SimHash fingerprints (full SQL value oracle via md5 bit ops) and
  simhash_near_pairs — EXACT whole-corpus Hamming<=3 search via 16-bit
  band pigeonhole, full bit_count(xor) SQL oracle,
- embedding-cosine near-dup pairs (SQL-oracled via double-precision dot),
- dedup_clusters (distributed hash-min connected components) and
  dedup_keep_list (the composed exact+near-dup keep set).

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
from .common import bucketed_group_apply

_MERSENNE = (1 << 61) - 1
N_HASHES = 64
N_BANDS = 16  # r = 4 rows/band
# the degenerate-bucket key packs band into the LOW 4 BITS of a uint64
# ((band_hash << 4) | band, two sites below): more than 16 bands would
# silently corrupt keys, so fail loudly here instead (ADVICE r4)
assert N_BANDS <= 16, "degenerate-bucket key packing holds band in 4 bits"
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


def _gram_codes(text: str) -> np.ndarray:
    """Sorted unique char-3-gram codes as uint64 — the vectorized,
    EXACT equivalent of ``_char_grams`` (VERDICT r4 #4): each gram packs
    its three code points into 3 x 21 bits (Unicode tops out at 21 bits),
    so the encoding is injective — no hash collisions, identical Jaccard
    counts to the string-set path by construction (property-tested in
    tests/test_queries_oracle.py::test_gram_codes_exactly_match_char_grams)."""
    # surrogatepass: lone surrogates (possible via surrogateescape-decoded
    # inputs) encode as their code points instead of raising — keeps this a
    # total drop-in for _char_grams on ANY str (code review r5)
    codes = np.frombuffer(
        text.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
    ).astype(np.uint64)
    if codes.size < 3:
        return np.empty(0, dtype=np.uint64)
    g = (codes[:-2] << np.uint64(42)) | (codes[1:-1] << np.uint64(21)) | codes[2:]
    return np.unique(g)


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


_BH_COLS = [f"bh{k:02d}" for k in range(N_BANDS)]


class MinHasher:
    """MinHash signature stage (map_batches FUNCTION, not an actor pool:
    the per-instance state is three 64-element coefficient arrays, too
    cheap to justify actor-pool spin-up — the instance pickles with the
    task).

    Round-3 rewrite (VERDICT r2 #1): the round-2 version still looped
    Python per doc building a (shingles x N_HASHES) matrix each. Now the
    whole batch's bytes are concatenated once, shingle-hashed as ONE
    vectorized pass, and per-doc minima come from a single
    ``np.minimum.reduceat`` per hash function over interleaved
    [start, end) offsets (the odd segments — windows straddling doc
    boundaries — are discarded). Signatures are bit-identical to round
    2's per-doc loop.

    Output rows carry the row's own (band, band_hash) PLUS all N_BANDS
    band hashes (bh00..bh15): the pair-emission stage uses them to emit
    each candidate pair exactly once — in the pair's minimal matching
    band — which deletes the round-2 cross-band (a, b) dedup shuffle.
    """

    _B = np.uint64(1099511628211)  # FNV-ish odd multiplier

    def __init__(self):
        rng = np.random.Generator(np.random.PCG64(1234))
        self.a = rng.integers(1, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)
        # band-combining coefficients (vectorized replacement for the
        # per-band md5-of-joined-string of round 1)
        self.band_c = rng.integers(1, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)

    def signatures(self, texts: list[str]) -> np.ndarray:
        """(n_docs, N_HASHES) uint64 minhash signatures, one flattened
        vectorized pass over the whole batch."""
        bufs = [t.encode("utf-8", "ignore") for t in texts]
        bufs = [b if len(b) >= 5 else b + b"\0" * (5 - len(b)) for b in bufs]
        lens = np.fromiter((len(b) for b in bufs), np.int64, count=len(bufs))
        raw = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        win = np.lib.stride_tricks.sliding_window_view(raw, 5).astype(np.uint64)
        h = np.zeros(len(win), dtype=np.uint64)
        for k in range(5):  # horner fold over the 5 window bytes
            h = h * self._B + win[:, k]
        # murmur-style avalanche so low-entropy text still spreads;
        # uint64 wraparound replaces the Mersenne modulo — determinism is
        # what matters for a permutation family, not universality
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        # interleaved reduceat offsets: even segments are each doc's valid
        # window range [start, start+len-4); odd segments are the 4
        # boundary-straddling windows between docs, discarded below
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        ends = starts + lens - 4
        idx = np.empty(2 * len(bufs) - 1, dtype=np.int64)
        idx[0::2] = starts
        idx[1::2] = ends[:-1]
        sigs = np.empty((len(bufs), N_HASHES), dtype=np.uint64)
        for k in range(N_HASHES):
            prods = h * self.a[k] + self.b[k]
            sigs[:, k] = np.minimum.reduceat(prods, idx)[0::2]
        return sigs

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            cols = {
                "doc_id": pd.Series([], dtype="int64"),
                "band": pd.Series([], dtype="int32"),
                "band_hash": pd.Series([], dtype="int64"),
            }
            cols.update(
                {c: pd.Series([], dtype="int64") for c in _BH_COLS}
            )
            return pd.DataFrame(cols)  # typed empty: schema-stable blocks
        sigs = self.signatures(list(df["text"]))
        n = len(df)
        rows_per_band = N_HASHES // N_BANDS
        # band hash: multiply-fold the band's signature slice (vectorized)
        folded = (sigs * self.band_c[None, :]).reshape(n, N_BANDS, rows_per_band)
        bh = folded.sum(axis=2, dtype=np.uint64)
        bh ^= bh >> np.uint64(31)
        bh *= np.uint64(0x9E3779B97F4A7C15)
        bh = bh.astype(np.int64)
        out = {
            "doc_id": np.repeat(df["doc_id"].to_numpy(), N_BANDS),
            "band": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
            "band_hash": bh.reshape(-1),
        }
        wide = np.repeat(bh, N_BANDS, axis=0)  # all bands on every row
        for k, c in enumerate(_BH_COLS):
            out[c] = wide[:, k]
        return pd.DataFrame(out)


MAX_LSH_BUCKET = 256  # degenerate-bucket cap, see minhash_lsh_candidates


def _oversized_band_keys(sigs, max_bucket: int) -> np.ndarray:
    """Sorted uint64 keys ((band_hash << 4) | band) of every degenerate
    (band, band_hash) bucket (> max_bucket members). Tiny by
    construction (each key names > max_bucket rows), so it broadcasts;
    one extra partial-count pass over the signature rows."""
    from .common import bucketed_sum

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["band", "band_hash"], as_index=False).agg(
            cnt=("doc_id", "size")
        )
        return g.astype({"band": "int32", "band_hash": "int64", "cnt": "int64"})

    counts = bucketed_sum(
        sigs.map_batches(count_partial, batch_format="pandas"),
        ["band", "band_hash"],
        ["cnt"],
    ).to_pandas()
    big = counts[counts["cnt"] > max_bucket]
    keys = (big["band_hash"].to_numpy().astype(np.uint64) << np.uint64(4)) | big[
        "band"
    ].to_numpy().astype(np.uint64)
    return np.sort(keys)


def minhash_lsh_candidates(sf_dir: str, max_bucket: int = MAX_LSH_BUCKET):
    """MinHash+LSH near-dup candidate pairs: shingle->minhash->band rows ->
    ONE groupby(band, band_hash) bucket shuffle -> all pairs within each
    bucket, each pair emitted only in its MINIMAL NON-DEGENERATE matching
    band. Output: distinct (a, b) candidate pairs, a < b. Rows-only driver
    oracle; the recall floor vs the exact n-gram-Jaccard slice plus a
    value test of the capped-bucket emission rule are asserted in
    tests/test_queries_oracle.py.

    Round-3 rewrite (VERDICT r2 #1/#2): round 2 emitted first-vs-rest
    pairs then shuffled them AGAIN on (a, b) to dedup across bands — the
    second exchange was pure fixed cost. Every signature row now carries
    all N_BANDS band hashes (~100 extra bytes/row), so a bucket task can
    decide locally whether ITS band is the pair's first matching band —
    exactly-once emission with a single shuffle. Semantics upgraded from
    first-vs-rest to the standard all-pairs-within-bucket candidate set
    (recall strictly higher). Buckets larger than MAX_LSH_BUCKET are
    skipped: a bucket that big is a degenerate near-identical cluster
    (O(k^2) pairs nobody should emit) — at scale those go through
    dedup_exact / dedup_clusters instead.

    Round-4 fix (ADVICE r3, medium): the round-3 rule silently LOST a pair
    when its first matching band's bucket was degenerate — that band
    skipped emission, while every later (healthy) band computed
    first_match = the degenerate band and rejected the pair. The global
    set of degenerate (band, band_hash) keys is now pre-counted (tiny:
    each key covers > MAX_LSH_BUCKET rows) and broadcast; first_match is
    the pair's first NON-degenerate matching band, so the cap only drops
    pairs whose every shared band is degenerate (the intended semantics:
    those go through exact dedup)."""
    import ray

    def pairs_per_bucket(g: pd.DataFrame, over_ref) -> pd.DataFrame:
        # fully vectorized over the bucket's ~thousands of (band, hash)
        # groups: iterating pandas groups costs ~100 us EACH (measured
        # 6.4 s single-core at sf0.1); instead sort once, find group
        # boundaries, and enumerate pairs for all same-SIZE groups in one
        # broadcast (offsets[:, None] + triu indices)
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
        )
        if not len(g):
            return empty
        g = g.sort_values(["band", "band_hash", "doc_id"], kind="mergesort")
        band = g["band"].to_numpy()
        bh_key = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy()
        bhs = g[_BH_COLS].to_numpy()
        new_grp = np.ones(len(g), dtype=bool)
        new_grp[1:] = (band[1:] != band[:-1]) | (bh_key[1:] != bh_key[:-1])
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, len(g)))
        over = ray.get(over_ref)
        band_ix = np.arange(N_BANDS, dtype=np.uint64)
        out_a: list = []
        out_b: list = []
        for k in np.unique(sizes):
            if k < 2 or k > max_bucket:
                continue
            offs = starts[sizes == k]
            idx = offs[:, None] + np.arange(k)[None, :]
            iu, ju = np.triu_indices(k, 1)
            ai = idx[:, iu].ravel()
            bi = idx[:, ju].ravel()
            eligible = bhs[ai] == bhs[bi]
            if over.size:
                # a matching band is ineligible for emission when its
                # (band, band_hash) bucket is degenerate (the bucket task
                # that owns it skipped enumeration entirely)
                keys = (bhs[ai].astype(np.uint64) << np.uint64(4)) | band_ix
                eligible &= ~np.isin(keys, over)
            # this bucket enumerated the pair, so its own band is always
            # eligible (k <= max_bucket) — argmax is well-defined
            keep = eligible.argmax(axis=1) == band[ai]
            out_a.append(ids[ai][keep])
            out_b.append(ids[bi][keep])
        if not out_a:
            return empty
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        ).astype("int64")

    # materialize: the signature blocks feed two consumers (the degenerate-
    # bucket census and the pair shuffle) — without pinning them, the
    # CPU-heavy MinHasher stage would execute twice. Signature rows are
    # small (ints only); they spill to the object store at scale.
    sigs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHasher(), batch_format="pandas", batch_size=512
    ).materialize()
    over_ref = ray.put(_oversized_band_keys(sigs, max_bucket))
    return bucketed_group_apply(
        sigs, ["band", "band_hash"], lambda g: pairs_per_bucket(g, over_ref)
    )


_WORD_HASH_CACHE: dict[str, int] = {}  # per WORKER PROCESS (module-level)


class SimHasher:
    """64-bit SimHash over md5 word hashes (map_batches FUNCTION — round
    3 moved it off the actor pool: with ~10 batches per sf0.1 run spread
    over a 30-actor pool, each actor processed <=1 batch, so per-actor
    caches never amortized while actor spin-up cost ~1.5 s. The word-hash
    cache now lives at WORKER-PROCESS module level, shared across tasks
    and queries on that worker).

    The md5 word hash is kept (not swapped for a cheaper hash) because it
    makes the whole operator expressible in DuckDB SQL (md5() + bit ops),
    giving simhash_fingerprints a REAL value oracle. Vectorized r2: words
    hash once each through the cache, bit expansion and the +1/-1
    accumulation run as one numpy reduceat per batch; results are
    bit-identical to the round-1 per-word loop.
    """

    def __init__(self):
        import re

        self.word = re.compile(r"[a-z]+")

    def _whash(self, w: str) -> int:
        h = _WORD_HASH_CACHE.get(w)
        if h is None:
            h = _md5_64(w)
            _WORD_HASH_CACHE[w] = h
        return h

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        words_per_doc = [self.word.findall(t.lower()) for t in df["text"]]
        counts = np.fromiter(
            (len(w) for w in words_per_doc), dtype=np.int64, count=len(words_per_doc)
        )
        flat = np.array(
            [self._whash(w) for ws in words_per_doc for w in ws], dtype=np.uint64
        )
        signs = np.zeros((len(df), 64), dtype=np.int64)
        if len(flat):
            bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            pm = 2 * bits.astype(np.int64) - 1
            nz = counts > 0
            offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
            acc = np.add.reduceat(pm, offsets[nz], axis=0)
            signs[nz] = acc
        packed = np.packbits(signs > 0, axis=1, bitorder="little")
        vals = packed.copy().view(np.uint64).reshape(-1).astype(np.int64)  # two's complement
        return pd.DataFrame({"doc_id": df["doc_id"], "simhash": vals})


def simhash_fingerprints(sf_dir: str):
    """Per-doc 64-bit SimHash with a full DuckDB value oracle (md5 word
    hashes + bit accumulation are SQL-expressible)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        SimHasher(), batch_format="pandas", batch_size=512
    )


SIMHASH_SQL = """
WITH w AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
), h AS (
  SELECT doc_id, CAST(('0x' || substr(md5(word),1,16)) AS UBIGINT) AS hw FROM w
), bits AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (hw >> CAST(i AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM h CROSS JOIN range(64) t(i) GROUP BY doc_id, i
), packed AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0
                       THEN CAST(1::UBIGINT << CAST(i AS INTEGER) AS HUGEINT)
                       ELSE 0 END) AS HUGEINT) AS uv
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN COALESCE(p.uv, 0) >= 9223372036854775808
                 THEN p.uv - 18446744073709551616
                 ELSE COALESCE(p.uv, 0) END AS BIGINT) AS simhash
FROM documents d LEFT JOIN packed p ON d.doc_id = p.doc_id
"""


HAMMING_T = 3
N_SIM_BANDS = 4  # 16 bits each; pigeonhole: hamming <= 3 -> >= 1 equal band
_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy < 2 has no bitwise_count)."""
    return _POPCOUNT8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int64)


def expand_hash_bands(
    ids: np.ndarray, hashes: np.ndarray, n_bands: int, band_bits: int
) -> pd.DataFrame:
    """Band-expansion rows (nid, band, band_val, hval) for a batch of
    64-bit fingerprints — the shuffle input of the banded Hamming search
    shared by simhash_near_pairs and phash_near_dups."""
    if not len(ids):
        return pd.DataFrame(
            {
                "nid": pd.Series([], dtype="int64"),
                "band": pd.Series([], dtype="int32"),
                "band_val": pd.Series([], dtype="int64"),
                "hval": pd.Series([], dtype="int64"),
            }
        )
    h = hashes.astype(np.uint64)
    mask = np.uint64((1 << band_bits) - 1)
    parts = []
    for b in range(n_bands):
        bv = (h >> np.uint64(band_bits * b)) & mask
        parts.append(
            pd.DataFrame(
                {
                    "nid": ids,
                    "band": np.full(len(ids), b, dtype=np.int32),
                    "band_val": bv.astype(np.int64),
                    "hval": hashes.view(np.int64)
                    if hashes.dtype == np.uint64
                    else hashes,
                }
            )
        )
    return pd.concat(parts, ignore_index=True)


def make_hamming_bucket_fn(n_bands: int, band_bits: int, threshold: int):
    """Per-bucket pair enumerator for the banded EXACT Hamming search
    (pigeonhole recall 1), with identical-hash COLLAPSE (ADVICE r3):
    rows sharing the full 64-bit hash are collapsed to one representative
    per (band, band_val) group before the O(k^2) triu enumeration, so a
    large exact-duplicate clique (every member lands in the same group in
    EVERY band) costs k = #distinct hashes, not #rows. The clique's own
    hamming-0 pairs are emitted once, from its band-0 group (for identical
    hashes every band is equal, so band 0 is the pair's first equal band);
    cross-hash rep pairs that pass the threshold expand to the member
    cross product. Output (a, b, hamming), a < b, each pair exactly once
    (in its first equal band) — bit-identical to the uncollapsed round-3
    enumeration."""

    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype="int64"),
            "b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        }
    )
    mask = np.uint64((1 << band_bits) - 1)

    def pairs_per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return empty
        g = g.sort_values(["band", "band_val", "hval", "nid"], kind="mergesort")
        band = g["band"].to_numpy()
        bval = g["band_val"].to_numpy()
        ids = g["nid"].to_numpy()
        hv = g["hval"].to_numpy().astype(np.uint64)
        n = len(g)
        # run starts of identical (band, band_val, hval) rows
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (
            (band[1:] != band[:-1]) | (bval[1:] != bval[:-1]) | (hv[1:] != hv[:-1])
        )
        run_start = np.flatnonzero(new_run)
        run_len = np.diff(np.append(run_start, n))
        # representative-level groups: one rep per run
        r_band = band[run_start]
        r_bval = bval[run_start]
        r_hv = hv[run_start]
        new_grp = np.ones(len(run_start), dtype=bool)
        new_grp[1:] = (r_band[1:] != r_band[:-1]) | (r_bval[1:] != r_bval[:-1])
        grp_start = np.flatnonzero(new_grp)
        grp_len = np.diff(np.append(grp_start, len(run_start)))
        out = []

        # (1) hamming-0 clique pairs: runs of length >= 2, band 0 only
        clique = np.flatnonzero((run_len >= 2) & (r_band == 0))
        for m in np.unique(run_len[clique]):
            offs = run_start[clique[run_len[clique] == m]]
            idx = offs[:, None] + np.arange(m)[None, :]
            iu, ju = np.triu_indices(m, 1)
            a_ = idx[:, iu].ravel()
            b_ = idx[:, ju].ravel()
            out.append(
                pd.DataFrame(
                    {
                        "a": ids[a_],  # ids ascending within a run -> a < b
                        "b": ids[b_],
                        "hamming": np.zeros(len(a_), dtype=np.int64),
                    }
                )
            )

        # (2) cross-hash rep pairs, expanded to member cross products
        for k in np.unique(grp_len):
            if k < 2:
                continue
            offs = grp_start[grp_len == k]
            idx = offs[:, None] + np.arange(k)[None, :]  # rep indices
            iu, ju = np.triu_indices(k, 1)
            ra = idx[:, iu].ravel()
            rb = idx[:, ju].ravel()
            x = r_hv[ra] ^ r_hv[rb]
            hd = _popcount64(x)
            band_eq = np.stack(
                [
                    ((x >> np.uint64(band_bits * b)) & mask) == 0
                    for b in range(n_bands)
                ],
                axis=1,
            )
            keep = (hd <= threshold) & (band_eq.argmax(axis=1) == r_band[ra])
            if not keep.any():
                continue
            ra, rb, hd = ra[keep], rb[keep], hd[keep]
            ca, cb = run_len[ra], run_len[rb]  # member multiplicities
            tot = ca * cb
            pair_ix = np.repeat(np.arange(len(ra)), tot)
            local = np.arange(int(tot.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(tot)[:-1])), tot
            )
            av = ids[run_start[ra][pair_ix] + local // cb[pair_ix]]
            bv_ = ids[run_start[rb][pair_ix] + local % cb[pair_ix]]
            out.append(
                pd.DataFrame(
                    {
                        "a": np.minimum(av, bv_),
                        "b": np.maximum(av, bv_),
                        "hamming": np.repeat(hd, tot).astype(np.int64),
                    }
                )
            )
        if not out:
            return empty
        return pd.concat(out, ignore_index=True).astype("int64")

    return pairs_per_bucket


def simhash_near_pairs(sf_dir: str):
    """EXACT whole-corpus Hamming-ball near-dup search over SimHash
    fingerprints: every pair with hamming(simhash_a, simhash_b) <=
    HAMMING_T, found distributed WITHOUT an all-pairs pass. 4 bands of 16
    bits: a pair within hamming 3 differs in at most 3 bands, so it
    SHARES at least one exact band (pigeonhole) — recall is exactly 1,
    which is why this operator has a full DuckDB value oracle
    (bit_count(xor(...)) self-join) unlike the probabilistic MinHash
    candidates. Each pair is emitted once, in its first equal band (the
    minhash exactly-once trick); verification inside the bucket is a
    vectorized XOR+popcount with identical-hash collapse (see
    make_hamming_bucket_fn). Output (a, b, hamming)."""

    sigs = simhash_fingerprints(sf_dir)

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        return expand_hash_bands(
            df["doc_id"].to_numpy() if len(df) else np.array([], dtype=np.int64),
            df["simhash"].to_numpy() if len(df) else np.array([], dtype=np.int64),
            N_SIM_BANDS,
            16,
        )

    expanded = sigs.map_batches(expand, batch_format="pandas")
    return bucketed_group_apply(
        expanded,
        ["band", "band_val"],
        make_hamming_bucket_fn(N_SIM_BANDS, 16, HAMMING_T),
    )


SIMHASH_NEAR_SQL = f"""
WITH s AS (
{SIMHASH_SQL}
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_T}
"""


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


EMB_DUP_T_E6 = 250_000  # cos_e6 threshold (matches the bounded baseline)
EMB_DUP_ASSIGN = 4  # multi-assignment width (P=3: recall 0.81, P=4: 0.94)
EMB_DUP_TARGET_CELL = 2_000  # expected rows per cell -> cell count scales with N


def embedding_dup_pairs_full(sf_dir: str):
    """Embedding-cosine near-dup pairs over the FULL embeddings table —
    the scale path the bounded embedding_dup_pairs baseline approximates
    exhaustively. Cluster-then-compare (FAISS-IVF shape, reusing the
    ann_ivf k-means trainer):

    1. train spherical k-means on a driver-bounded sample; the CELL COUNT
       SCALES WITH THE TABLE (n_rows / EMB_DUP_TARGET_CELL, floor 16), so
       expected in-cell all-pairs work stays ~TARGET_CELL^2 regardless of
       corpus size (raise the target only with task memory);
    2. every vector joins its top-EMB_DUP_ASSIGN cells (multi-assignment
       recovers boundary pairs two single assignments would split);
    3. ONE bucketed shuffle on cell id; inside each cell an exact
       double-precision cosine matmul emits (a, b, cos_e6) for cos >=
       threshold — verification is exact, so precision is 1 and recall is
       the only approximation (pairs sharing no top-P cell);
    4. pairs found in several shared cells dedupe in a final bucketed
       pass on (a, b).

    Rows-only for the driver (candidate generation is probabilistic);
    tests pin slice agreement with the exact vec_id<300 oracle pairs and
    a measured recall floor vs the exact all-pairs set."""
    import ray

    from .common import bucketed_group_apply
    from .similarity import _emb, _spherical_kmeans

    ds = _emb(sf_dir)
    n_rows = ds.count()
    n_cells = max(16, n_rows // EMB_DUP_TARGET_CELL)
    stride = max(1, n_rows // 4096)

    def take_sample(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["vec_id"].to_numpy() % stride == 0]

    sample = np.stack(
        ds.map_batches(take_sample, batch_format="pandas")
        .to_pandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent_ref = ray.put(_spherical_kmeans(sample, n_cells))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        cent = ray.get(cent_ref)
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        p = min(EMB_DUP_ASSIGN, len(cent))
        cells = np.argsort(-(mat @ cent.T), axis=1)[:, :p]  # top-P cells
        return pd.DataFrame(
            {
                "cell": cells.ravel().astype("int64"),
                "vec_id": np.repeat(df["vec_id"].to_numpy(), p),
                "embedding": np.repeat(df["embedding"].to_numpy(), p),
            }
        )

    def in_cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # a bucket may hold SEVERAL cells (hash(cell) % n_buckets) — pairs
        # are per CELL, so group first; the loop is over the few cells of
        # one bucket, each iteration a vectorized matmul
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "cos_e6": pd.Series([], dtype="int64"),
            }
        )
        out = []
        for _, c in g.groupby("cell"):
            if len(c) < 2:
                continue
            ids = c["vec_id"].to_numpy()
            mat = np.stack(c["embedding"].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ mat.T
            iu, ju = np.triu_indices(len(c), 1)
            keep = sims[iu, ju] >= EMB_DUP_T_E6 / 1e6
            if not keep.any():
                continue
            ia, ib = ids[iu[keep]], ids[ju[keep]]
            out.append(
                pd.DataFrame(
                    {
                        "a": np.minimum(ia, ib),
                        "b": np.maximum(ia, ib),
                        "cos_e6": np.floor(
                            1e6 * sims[iu[keep], ju[keep]]
                        ).astype("int64"),
                    }
                ).astype("int64")
            )
        return pd.concat(out, ignore_index=True) if out else empty

    cand = bucketed_group_apply(
        ds.map_batches(assign, batch_format="pandas"), ["cell"], in_cell_pairs
    )
    return bucketed_group_apply(
        cand, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"])
    )




def dedup_clusters(sf_dir: str):
    """Duplicate-cluster assignment: connected components over the exact
    n-gram-Jaccard edge set (the bounded doc_id < JACCARD_SLICE slice,
    J >= 0.3 — the same edges ngram_jaccard_pairs emits), computed with
    DISTRIBUTED hash-min label propagation. Output (doc_id, cluster_id)
    where cluster_id = min doc_id of the component; a training-data dedup
    keeps one doc per cluster (doc_id == cluster_id).

    Scale shape: each iteration is one bucketed key-partitioned join
    (edges + labels co-located by node, never materialized on the driver)
    followed by a bucketed min — the standard BSP connected-components
    loop; iterations = component diameter (near-dup clusters are
    near-cliques, so 2-3). At 100 TB the edge set comes from the
    MinHash-LSH candidates instead of the exact slice; the component loop
    is unchanged. The driver only ever sees the per-iteration changed
    count.
    """

    from .common import symmetric_edges

    pairs = ngram_jaccard_pairs(sf_dir).map_batches(
        lambda df: df[["a", "b"]], batch_format="pandas"
    )
    edges = symmetric_edges(pairs)

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] < JACCARD_SLICE]
        return pd.DataFrame(
            {"node": df["doc_id"].astype("int64"), "lbl": df["doc_id"].astype("int64")}
        )

    labels = _docs(sf_dir, ["doc_id"]).map_batches(seed, batch_format="pandas")
    labels = hash_min_components(edges, labels)
    out = labels.to_pandas().rename(columns={"node": "doc_id", "lbl": "cluster_id"})
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def hash_min_components(
    edges, labels=None, n_buckets: int | None = None, max_iters: int = 50
):
    """Distributed hash-min connected components (the BSP label-propagation
    loop dedup_clusters documents), factored out so any near-dup edge
    source (n-gram Jaccard, MinHash candidates, image phash pairs) can be
    collapsed to components. ``edges``: symmetric Dataset(node, peer);
    ``labels``: seed Dataset(node, lbl) (lbl = node), or None to SELF-SEED
    from the edge set (r5): the edges are symmetric, so every node's rows
    land in its home bucket and the first propagate round derives
    lbl(node)=node in-bucket — one fewer full exchange. Self-seed emits
    labels only for nodes that HAVE edges; callers that need singleton
    components for isolated nodes (dedup_clusters seeds from the whole doc
    table) must pass explicit labels. Returns
    Dataset(node, lbl = component minimum).

    Iterates until no label changes (iterations = component diameter;
    near-dup clusters are near-cliques, so 2-3). ``max_iters`` is a hard
    safety cap: hitting it with labels still changing RAISES rather than
    silently returning non-converged labels (ADVICE r3 — a keep-list built
    from unconverged labels would retain extra near-duplicates with no
    signal)."""

    cols = ["node", "peer", "lbl"]
    # tag + pin the edge side ONCE: it is loop-invariant, and re-mapping
    # it every iteration re-ran the map stage (and, before round 4, the
    # whole upstream LSH) per BSP step
    tagged_e = edges.map_batches(
        lambda df: df.assign(lbl=-1)[cols], batch_format="pandas"
    ).materialize()
    if n_buckets is None:
        # every BSP round pays a fixed cost per bucket (sort partition +
        # map_groups task + output block), MULTIPLIED by the round count —
        # so size buckets to the edge volume (~50k edges/bucket keeps a
        # bucket's fixpoint work in one task's sweet spot), capped by the
        # cluster-scaled count that 100-TB edge sets need
        from .common import scaled_n_buckets

        n_buckets = int(
            min(scaled_n_buckets(), max(4, tagged_e.count() // 50_000 + 1))
        )
    converged = False
    tagged_e = tagged_e.repartition(n_buckets).materialize()
    for _ in range(max_iters):
        seed_round = labels is None  # only ever true on the first round
        if seed_round:
            stream = tagged_e
        else:
            tagged_l = labels.map_batches(
                lambda df: df.assign(peer=-1)[cols], batch_format="pandas"
            )
            stream = tagged_e.union(tagged_l)

        def propagate(g: pd.DataFrame, _seed: bool = seed_round) -> pd.DataFrame:
            # rows of one node-bucket: label rows (peer == -1) + edge rows.
            # Vectorized (VERDICT r3 #7), and run to LOCAL FIXPOINT within
            # the bucket (round 4): min labels propagate across the whole
            # local subgraph before anything ships, so the number of
            # GLOBAL BSP rounds (each a 2-shuffle barrier) drops from the
            # component diameter to the cross-bucket diameter — measured
            # 7 -> 3 rounds at sf0.001, 20+ -> 4 at sf0.01. Sound because
            # hash-min is monotone: any candidate emitted is the min over
            # some reachable set, and take_min keeps the global min.
            e = g.loc[g["peer"] != -1, ["node", "peer"]]
            if _seed:
                # symmetric edges => every node in this bucket's edge rows
                # is resident here; seed lbl(node)=node locally
                u = e["node"].drop_duplicates()
                lbls = pd.DataFrame({"node": u, "lbl": u}).astype("int64")
            else:
                lbls = g.loc[g["peer"] == -1, ["node", "lbl"]]
            if not len(e):
                return pd.DataFrame(
                    {"node": lbls["node"], "cand": lbls["lbl"], "old": lbls["lbl"]}
                ).astype("int64")
            all_ids = pd.concat(
                [e["node"], e["peer"], lbls["node"]], ignore_index=True
            )
            codes, uniq = pd.factorize(all_ids)
            uniq = np.asarray(uniq, dtype=np.int64)
            eu = codes[: len(e)]
            ev = codes[len(e) : 2 * len(e)]
            lidx = codes[2 * len(e) :]
            inf = np.int64(2**62)
            v = np.full(len(uniq), inf, dtype=np.int64)
            v[lidx] = lbls["lbl"].to_numpy()  # one label row per node
            old = v.copy()
            while True:  # vectorized local hash-min; iters = local diameter
                nv = v.copy()
                np.minimum.at(nv, eu, v[ev])
                np.minimum.at(nv, ev, v[eu])
                if np.array_equal(nv, v):
                    break
                v = nv
            # resident rows carry their old label (0 on messages: max() in
            # take_min recovers it per node); non-resident locals emit a
            # message only when a finite min reached them
            res = pd.DataFrame({"node": uniq[lidx], "cand": v[lidx], "old": old[lidx]})
            nonres = np.ones(len(uniq), dtype=bool)
            nonres[lidx] = False
            nonres &= v < inf
            msg = pd.DataFrame(
                {
                    "node": uniq[nonres],
                    "cand": v[nonres],
                    "old": np.zeros(int(nonres.sum()), dtype=np.int64),
                }
            )
            return pd.concat([res, msg], ignore_index=True).astype("int64")

        msgs = bucketed_group_apply(stream, ["node"], propagate, n_buckets=n_buckets)

        def take_min(g: pd.DataFrame) -> pd.DataFrame:
            # the node's own current label is always among the candidates
            # (propagate emits it), so min(cand) vs max(cand-from-self) is
            # not usable; instead carry old label via a second groupby key
            m = g.groupby("node", as_index=False).agg(
                lbl=("cand", "min"), old=("old", "max")
            )
            m["changed"] = (m["lbl"] != m["old"]).astype("int64")
            return m[["node", "lbl", "changed"]]

        new_labels = (
            bucketed_group_apply(msgs, ["node"], take_min, n_buckets=n_buckets)
            # bound the label block count: Ray's sort emits as many blocks
            # as the union had, so without this coalesce labels gained
            # +|edge blocks| blocks per iteration and per-step wall grew
            # linearly (measured 1.9s -> 8.5s over 7 steps at sf0.001)
            .repartition(n_buckets)
            .materialize()
        )  # materialize truncates lineage: each BSP step re-executes
        # otherwise, making iteration k cost O(k) recomputes
        n_changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"])
        if not n_changed:
            converged = True
            break

    if not converged:
        raise RuntimeError(
            f"hash_min_components did not converge within {max_iters} "
            "iterations (component diameter exceeds the cap) - refusing to "
            "return partial labels"
        )
    return labels


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
{NGRAM_JACCARD_SQL.replace('SELECT a, b,', 'SELECT a, b,')}
), edges AS (
  SELECT a AS node, b AS peer FROM pairs
  UNION ALL
  SELECT b AS node, a AS peer FROM pairs
), nodes AS (
  SELECT doc_id FROM documents WHERE doc_id < {JACCARD_SLICE}
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.peer FROM reach r JOIN edges e ON e.node = r.dst
)
SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
"""


def minhash_verified_pairs(sf_dir: str, max_bucket: int = MAX_LSH_BUCKET):
    """Stage 2 of the PRODUCTION dedup composition (VERDICT r3 #1):
    exact char-3-gram Jaccard verification of the full-table MinHash-LSH
    candidates. Every emitted (a, b, jac_e6) edge truly has J3 >= 0.3 —
    LSH bounds recall, verification restores exact precision.

    Scale shape: the candidate set joins the documents table twice via
    two-sided co-partition (tag, union, ONE bucketed shuffle per side —
    the events_asof_order pattern): first keyed by ``a`` to attach
    text_a, then rekeyed by ``b`` to meet text_b, where the Jaccard runs
    with per-bucket gram-set caching. No broadcast of the corpus, no
    driver materialization; cost is linear in candidates + 2 passes over
    the documents table."""

    pairs = minhash_lsh_candidates(sf_dir, max_bucket)
    docs = _docs(sf_dir, ["doc_id", "text"])

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["doc_id"].astype("int64"),
                "text": df["text"].astype(object),
                "a": np.full(len(df), -1, dtype=np.int64),
                "b": np.full(len(df), -1, dtype=np.int64),
            }
        )

    def tag_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["a"].astype("int64"),
                "text": np.full(len(df), "", dtype=object),
                "a": df["a"].astype("int64"),
                "b": df["b"].astype("int64"),
            }
        )

    def attach_a(g: pd.DataFrame) -> pd.DataFrame:
        # pair rows pick up text_a from the co-located doc rows, then
        # re-key on b (same (k, text, a, b) layout so stage 2 unions with
        # the doc stream directly)
        texts = g.loc[g["a"] == -1, ["k", "text"]]
        p = g.loc[g["a"] != -1, ["k", "a", "b"]].merge(texts, on="k", how="inner")
        return pd.DataFrame(
            {
                "k": p["b"].astype("int64"),
                "text": p["text"].astype(object),
                "a": p["a"].astype("int64"),
                "b": p["b"].astype("int64"),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "jac_e6": pd.Series([], dtype="int64"),
            }
        )
        p = g[g["a"] != -1]
        if not len(p):
            return empty
        text_b = dict(zip(g.loc[g["a"] == -1, "k"], g.loc[g["a"] == -1, "text"]))
        # per-bucket cache of sorted-unique gram CODES by doc id: the
        # per-pair work is a C-speed sorted intersection instead of the
        # round-4 Python set build + intersection (VERDICT r4 #4)
        grams: dict[int, np.ndarray] = {}
        out_a, out_b, out_j = [], [], []
        for a, b, ta in zip(p["a"], p["b"], p["text"]):
            ga = grams.get(int(a))
            if ga is None:
                ga = grams[int(a)] = _gram_codes(ta)
            gb = grams.get(int(b))
            if gb is None:
                gb = grams[int(b)] = _gram_codes(text_b[b])
            # membership count on the pre-sorted arrays: O(m log n), no
            # re-sort/allocation like np.intersect1d (code review r5)
            big, small = (ga, gb) if ga.size >= gb.size else (gb, ga)
            idx = np.searchsorted(big, small)
            mask = idx < big.size
            inter = int(np.count_nonzero(big[idx[mask]] == small[mask]))
            union = ga.size + gb.size - inter
            jac_e6 = int(np.floor(1_000_000.0 * inter / union)) if union else 0
            if jac_e6 >= JACCARD_T:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(jac_e6)
        if not out_a:
            return empty
        return pd.DataFrame({"a": out_a, "b": out_b, "jac_e6": out_j}).astype(
            "int64"
        )

    doc_stream = docs.map_batches(tag_docs, batch_format="pandas")
    stage1 = bucketed_group_apply(
        doc_stream.union(pairs.map_batches(tag_pairs, batch_format="pandas")),
        ["k"],
        attach_a,
    )
    return bucketed_group_apply(doc_stream.union(stage1), ["k"], verify)


def dedup_keep_list_full(sf_dir: str, broadcast_cap: int = 500_000):
    """The production-composition dedup DELIVERABLE over the FULL
    documents table (VERDICT r3 #1 — no doc_id slice anywhere):

    1. exact dedup — bucketed content-hash shuffle, min doc_id wins;
    2. MinHash-LSH candidates over the whole corpus (one band shuffle);
    3. exact-Jaccard verification of the candidates (minhash_verified_pairs
       — two co-partitioned joins against the documents table);
    4. connected components over the VERIFIED edge set (hash_min_components
       BSP loop; edges materialized once so each BSP step doesn't re-run
       LSH);
    5. keep = exact keepers minus non-minimum component members, applied
       via subtract_ids — broadcast when the drop set is small, bucketed
       anti-join above ``broadcast_cap`` (VERDICT r3 #2).

    Returns a Dataset(doc_id). Rows-only driver oracle; the value oracle
    (DuckDB recursive CTE over the Ray-verified edge set) and the
    slice-agreement check live in tests/test_queries_oracle.py."""
    from .common import subtract_ids, symmetric_edges

    # materialize: the BSP component loop consumes the edge set once per
    # iteration — without pinning, every iteration would re-run LSH +
    # verification from the raw corpus
    edges = symmetric_edges(minhash_verified_pairs(sf_dir)).materialize()

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()),
            }
        )

    def exact_keepers(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fp", as_index=False)["doc_id"].min()[["doc_id"]]

    keepers = bucketed_group_apply(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            hash_batch, batch_format="pandas"
        ),
        ["fp"],
        exact_keepers,
    )
    if edges.count() == 0:
        return keepers

    # self-seeded: losers by definition have edges, so edge-only seeding
    # is complete here (isolated keepers never appear in labels)
    from .common import component_losers

    losers = component_losers(hash_min_components(edges), "doc_id")
    return subtract_ids(keepers, losers, "doc_id", broadcast_cap=broadcast_cap)


def dedup_keep_list(sf_dir: str):
    """The end-to-end dedup DELIVERABLE: the doc_ids a training run keeps
    after (1) exact-content dedup (min doc_id per content hash wins) and
    (2) near-duplicate cluster dedup (min doc_id per connected component
    of the exact-Jaccard graph wins; the bounded doc_id < JACCARD_SLICE
    slice, same edges as dedup_clusters).

    Scale shape: stage (1) is the bucketed content-hash shuffle; stage
    (2)'s drop list applies via subtract_ids (broadcast while the dup
    clusters are small, bucketed anti-join above the cap — VERDICT r3
    #2). The full-table production composition (LSH candidates ->
    verification -> components) is dedup_keep_list_full."""
    import ray.data as rd

    from .common import subtract_ids

    clusters = dedup_clusters(sf_dir)  # (doc_id, cluster_id), bounded slice
    losers = rd.from_pandas(
        clusters.loc[clusters["doc_id"] != clusters["cluster_id"], ["doc_id"]]
    )

    def exact_keepers(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.groupby("fp", as_index=False)["doc_id"].min()
        return keep[["doc_id"]]

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()),
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        hash_batch, batch_format="pandas"
    )
    kept = bucketed_group_apply(ds, ["fp"], exact_keepers)
    return subtract_ids(kept, losers, "doc_id")


DEDUP_KEEP_SQL = f"""
WITH RECURSIVE pairs AS (
{NGRAM_JACCARD_SQL}
), edges AS (
  SELECT a AS node, b AS peer FROM pairs
  UNION ALL
  SELECT b AS node, a AS peer FROM pairs
), nodes AS (
  SELECT doc_id FROM documents WHERE doc_id < {JACCARD_SLICE}
), reach(src, dst) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.peer FROM reach r JOIN edges e ON e.node = r.dst
), clusters AS (
  SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src
), exact_keep AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
)
SELECT k.doc_id FROM exact_keep k
LEFT JOIN clusters c ON c.doc_id = k.doc_id
WHERE c.doc_id IS NULL OR c.cluster_id = c.doc_id
"""


# --- exact substring (span) dedup --------------------------------------
SPAN_K = 40  # duplicated-window length in characters (code points)
# two independent 64-bit wraparound polynomial bases: the dup criterion is
# equality of the (h1, h2) pair, a 128-bit identity — collision probability
# over W windows is ~W^2/2^129 (1e12 windows -> ~1e-15), so hash-bucket
# membership stands in for exact gram equality without shipping gram text
# (k x corpus-size inflation) through the shuffle
_SPAN_B1 = np.uint64(1_000_003)
_SPAN_B2 = np.uint64(10_000_019)


def _span_window_hashes(cp: np.ndarray, powers: np.ndarray) -> np.ndarray:
    """All SPAN_K-length window hashes of one code-point array (uint64
    wraparound polynomial), vectorized via sliding_window_view."""
    win = np.lib.stride_tricks.sliding_window_view(cp, SPAN_K)
    return (win * powers).sum(axis=1, dtype=np.uint64)


def _substring_dup_spans_ds(docs, broadcast_cap: int = 2_000_000):
    """Core of substring_dup_spans over any (doc_id, text) Dataset.

    Two-pass candidate filtering keeps the exchange near corpus size
    instead of 4x it: a naive single pass ships (doc_id, pos, h1, h2) =
    32 bytes for EVERY window (~32x the text bytes at 100 TB). Pass 1
    ships only per-batch partial (h1, count) rows (<= 16 B/window, less
    under repetition) through a bucketed sum and keeps the h1 values
    seen >= 2 times; pass 2 re-derives windows (cheap vectorized numpy —
    recompute beats shipping) and emits full rows ONLY for candidate
    hashes, which in a real corpus is the small duplicated fraction. The
    candidate rows then get the exact (h1, h2) duplicate check in-bucket
    (kills h1-only collisions) and flow to the span merge. The dup-hash
    set applies broadcast-style below ``broadcast_cap`` (ray.put once,
    sorted-array searchsorted membership per batch) and as a bucketed
    co-partitioned semi-join above it (high-dup corpora; both sides
    shuffle once on h1, nothing broadcasts)."""
    import ray

    from .common import bucketed_sum, sorted_isin

    p1 = _SPAN_B1 ** np.arange(SPAN_K - 1, -1, -1, dtype=np.uint64)
    p2 = _SPAN_B2 ** np.arange(SPAN_K - 1, -1, -1, dtype=np.uint64)

    def _doc_windows(did, text):
        # code points (== SQL substr / Python len character semantics)
        cp = np.frombuffer(
            text.encode("utf-32-le", "surrogatepass"), dtype=np.uint32
        ).astype(np.uint64)
        if len(cp) < SPAN_K:
            return None
        return cp

    def h1_counts(df: pd.DataFrame) -> pd.DataFrame:
        hs = []
        for did, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
            cp = _doc_windows(did, text)
            if cp is None:
                continue
            hs.append(_span_window_hashes(cp, p1))
        if not hs:
            return pd.DataFrame(
                {"h1": pd.Series(dtype="int64"), "c": pd.Series(dtype="int64")}
            )
        uniq, cnt = np.unique(np.concatenate(hs), return_counts=True)
        return pd.DataFrame(
            {"h1": uniq.view(np.int64), "c": cnt.astype(np.int64)}
        )

    counts = bucketed_sum(
        docs.map_batches(h1_counts, batch_format="pandas"), ["h1"], ["c"]
    )
    dup_h = counts.map_batches(
        lambda df: df.loc[df["c"] >= 2, ["h1"]], batch_format="pandas"
    ).materialize()

    def windows(df: pd.DataFrame, keep_sorted: np.ndarray | None) -> pd.DataFrame:
        ids, poss, h1s, h2s = [], [], [], []
        for did, text in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
            cp = _doc_windows(did, text)
            if cp is None:
                continue
            h1 = _span_window_hashes(cp, p1)
            if keep_sorted is not None:
                mask = sorted_isin(keep_sorted, h1)
                if not mask.any():
                    continue
            else:
                mask = np.ones(len(h1), dtype=bool)
            pos = np.flatnonzero(mask).astype(np.int64)
            ids.append(np.full(len(pos), did, dtype=np.int64))
            poss.append(pos)
            h1s.append(h1[mask].view(np.int64))
            # h2 only at surviving positions: in the sparse-dup regime
            # the two-pass design targets, computing h2 for every window
            # and masking wastes ~all of it (review r5); the window view
            # makes the gather O(survivors * K)
            win2 = np.lib.stride_tricks.sliding_window_view(cp, SPAN_K)
            h2s.append(
                (win2[pos] * p2).sum(axis=1, dtype=np.uint64).view(np.int64)
            )
        if not ids:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "pos": pd.Series(dtype="int64"),
                    "h1": pd.Series(dtype="int64"),
                    "h2": pd.Series(dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(ids),
                "pos": np.concatenate(poss),
                "h1": np.concatenate(h1s),
                "h2": np.concatenate(h2s),
            }
        )

    if dup_h.count() <= broadcast_cap:
        keep = np.sort(dup_h.to_pandas()["h1"].to_numpy().view(np.uint64))
        keep_ref = ray.put(keep)

        def win_filtered(df: pd.DataFrame) -> pd.DataFrame:
            return windows(df, ray.get(keep_ref))

        cand = docs.map_batches(win_filtered, batch_format="pandas")
    else:
        # co-partitioned semi-join: window rows + dup-hash rows bucketed
        # on h1, per bucket keep windows whose h1 is in the dup set
        def win_all(df: pd.DataFrame) -> pd.DataFrame:
            out = windows(df, None)
            out["is_hash"] = np.int64(0)
            return out

        def tag_hash(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": np.full(len(df), -1, dtype=np.int64),
                    "pos": np.full(len(df), -1, dtype=np.int64),
                    "h1": df["h1"].astype("int64"),
                    "h2": np.full(len(df), 0, dtype=np.int64),
                    "is_hash": np.ones(len(df), dtype=np.int64),
                }
            )

        def semi(g: pd.DataFrame) -> pd.DataFrame:
            dup_set = g.loc[g["is_hash"] == 1, "h1"].to_numpy()
            w = g[g["is_hash"] == 0]
            return w.loc[
                w["h1"].isin(dup_set), ["doc_id", "pos", "h1", "h2"]
            ]

        union = docs.map_batches(win_all, batch_format="pandas").union(
            dup_h.map_batches(tag_hash, batch_format="pandas")
        )
        cand = bucketed_group_apply(union, ["h1"], semi)

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        return g.loc[g.duplicated(["h1", "h2"], keep=False), ["doc_id", "pos"]]

    def merge_spans(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "span_start": pd.Series(dtype="int64"),
                    "span_end": pd.Series(dtype="int64"),
                }
            )
        g = g.sort_values(["doc_id", "pos"])
        did = g["doc_id"].to_numpy()
        pos = g["pos"].to_numpy()
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        # same span while windows overlap or touch: next_pos - pos <= K
        new[1:] = (did[1:] != did[:-1]) | (pos[1:] - pos[:-1] > SPAN_K)
        starts = np.flatnonzero(new)
        ends_idx = np.concatenate([starts[1:] - 1, [len(g) - 1]])
        return pd.DataFrame(
            {
                "doc_id": did[starts],
                "span_start": pos[starts],
                "span_end": pos[ends_idx] + SPAN_K,
            }
        )

    dup = bucketed_group_apply(cand, ["h1", "h2"], dup_positions)
    return bucketed_group_apply(dup, ["doc_id"], merge_spans)


def substring_dup_spans(sf_dir: str):
    """Exact substring dedup (the 'Deduplicating Training Data Makes
    Language Models Better' ExactSubstr operator, Lee et al. 2021,
    arXiv:2107.06499): find every maximal character span of a document
    whose every SPAN_K-length window also occurs elsewhere in the corpus
    (another document, or another position of the same document). Output
    one row per maximal span: (doc_id, span_start, span_end), 0-based,
    end-exclusive — the spans a trainer would cut before tokenization.

    Shape at 100 TB: windowing + rolling hashes are per-batch numpy
    (sliding_window_view over code points — no per-character Python); the
    only shuffles are (1) a bucketed groupby on the 128-bit window
    identity (h1, h2) that emits the >=2-occurrence positions and (2) a
    bucketed per-doc span merge (sort + vectorized island detection).
    Window text never ships — the paper's suffix-array formulation needs
    a global sort of the whole corpus; the windowed-hash formulation is
    embarrassingly bucketed (same output for spans >= SPAN_K, which is
    the published operating point)."""
    return _substring_dup_spans_ds(_docs(sf_dir, ["doc_id", "text"]))


SUBSTRING_DUP_SQL = f"""
WITH grams AS (
  SELECT doc_id, pos, substr(text, CAST(pos AS INT), {SPAN_K}) AS gram
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - {SPAN_K - 1})) AS pos
        FROM documents)
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
dupg AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
              <= {SPAN_K}
         THEN 0 ELSE 1 END AS brk
  FROM dupg),
grp AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM isl)
SELECT doc_id, CAST(min(pos) - 1 AS BIGINT) AS span_start,
       CAST(max(pos) - 1 + {SPAN_K} AS BIGINT) AS span_end
FROM grp GROUP BY doc_id, gid
"""


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "substring_dup_spans": (substring_dup_spans, SUBSTRING_DUP_SQL),
    "dedup_keep_list": (dedup_keep_list, DEDUP_KEEP_SQL),
    "minhash_verified_pairs": (minhash_verified_pairs, None),
    "dedup_keep_list_full": (dedup_keep_list_full, None),
    "ngram_jaccard_pairs": (ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
    "minhash_lsh_candidates": (minhash_lsh_candidates, None),
    "simhash_fingerprints": (simhash_fingerprints, SIMHASH_SQL),
    "simhash_near_pairs": (simhash_near_pairs, SIMHASH_NEAR_SQL),
    "embedding_dup_pairs": (embedding_dup_pairs, EMBEDDING_DUP_SQL),
    "embedding_dup_pairs_full": (embedding_dup_pairs_full, None),
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
}
