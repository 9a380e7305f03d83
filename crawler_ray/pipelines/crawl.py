"""Round-based BFS crawl driver: the Ray-Data re-expression of the
reference's worker/monitor loops (/root/reference/src/Main.hs:22-68,
Crawl.hs:92-185).

Each round is one streaming Dataset pass (SURVEY.md §3.2):

    frontier(k) --groupby(host-shard)--> FetchGroup actor pool   [shuffle 1]
       | metadata rows (links/completions/logs/order); payload bytes are
       | written to per-shard parquet INSIDE the fetch task and never shuffle
       v
    terminal phase: completions/failures/releases -> seen shards
    candidate phase: links --groupby(seen-shard)--> dedup + check_and_insert
                                                             [shuffle 2]
       v
    frontier(k+1) parquet + seen-delta parquet + manifest (checkpoint)

Termination: empty next frontier, or stored-doc quota (Main.hs:61-68), or
max_rounds.

Scale discipline: the driver never holds row data — round metadata is
materialized once into the OBJECT STORE (metadata-only rows: URLs + small
ints) and consumed by dataset ops; the next frontier goes to parquet and is
re-read next round (doubling as the checkpoint); seen-set deltas are written
by each shard actor itself. Driver heap sees only counters. The quota trim
of the final round is the only payload-sorting step and touches at most
``limit`` rows.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..fetchsim import FetchPolicy
from ..state.seen import COMPLETED, FAILED, make_shards
from ..stages.fetch import FetchGroup, frontier_shard_column
from ..urlkit import canonicalise, get_domain, url_hash
from ..webgen import WebSpec

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("p_host", pa.string()),
        ("p_seq", pa.int64()),
        ("link_idx", pa.int32()),
    ]
)


@dataclass
class CrawlConfig:
    spec: WebSpec
    corpus_path: str
    seeds: list[str]
    policy: FetchPolicy
    run_dir: str
    limit: int | None = None
    max_rounds: int = 50
    n_fetch_shards: int = 16
    n_seen_shards: int = 8
    # fetch pool size; keep strictly below the session's num_cpus so the
    # read/shuffle tasks upstream of the pool can still schedule
    fetch_concurrency: int | tuple = 4
    politeness_delay: float = 0.0
    record_metrics: bool = False
    seen_capacity_per_shard: int = 1 << 17


@dataclass
class CrawlSummary:
    rounds: int = 0
    stored: int = 0
    fetched: int = 0
    run_dir: str = ""
    frontier_exhausted: bool = False
    quota_reached: bool = False
    round_stats: list[dict] = field(default_factory=list)


def _np_u64(vals):
    import numpy as np

    return np.array(vals, dtype=np.uint64)


class _CombinedPhase:
    """Per-seen-shard group over the fetch stage's metadata rows: applies
    this shard's terminal mutations FIRST (completions/failures/releases —
    Crawl.hs:169-183), then runs processNextUrl for this shard's candidate
    links (within-round dedup by minimal discovery key, then bulk
    insertIfNotDone, Crawl.hs:187-201). Because every mutation of a URL
    routes to its own shard's single group, the terminal-before-candidate
    order holds per URL; cross-URL order doesn't matter. The groupby that
    feeds this stage is an all-to-all barrier, so the whole fetch phase
    (including its read-only trap-guard lookups) finished already.

    Output: next-frontier rows plus one stats row (url="") per group."""

    def __init__(self, handles, n_shards):
        self.handles = handles
        self.n = n_shards

    def __call__(self, group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_pylist()
        urls = group["url"].to_pylist()
        n_proc = n_docs = 0
        term_u, term_h, term_c = [], [], []
        releases = []
        cand_idx = []
        for i, k in enumerate(kinds):
            if k == "stat":
                n_proc += int(group["p_seq"][i].as_py())
                n_docs += int(group["seq"][i].as_py())
            elif k == "link":
                cand_idx.append(i)
            elif k == "release":
                releases.append(urls[i])
            else:  # completed | failed
                term_u.append(urls[i])
                term_h.append(url_hash(urls[i]))
                term_c.append(COMPLETED if k == "completed" else FAILED)

        shard = None
        refs = []
        if term_u:
            shard = term_h[0] % self.n
            refs.append(
                self.handles[shard].apply_terminal.remote(term_u, _np_u64(term_h), term_c)
            )
        if releases:
            shard = url_hash(releases[0]) % self.n
            refs.append(self.handles[shard].remove_in_progress.remote(releases))
        if refs:
            ray.get(refs)  # terminal phase durable before candidate phase

        keep: list[int] = []
        if cand_idx:
            keys = {
                i: (
                    group["p_host"][i].as_py(),
                    group["p_seq"][i].as_py(),
                    group["link_idx"][i].as_py(),
                )
                for i in cand_idx
            }
            best: dict[str, int] = {}
            for i in cand_idx:
                u = urls[i]
                j = best.get(u)
                if j is None or keys[i] < keys[j]:
                    best[u] = i
            idxs = sorted(best.values(), key=lambda i: keys[i])
            uniq = [urls[i] for i in idxs]
            hashes = [url_hash(u) for u in uniq]
            shard = hashes[0] % self.n
            ok = ray.get(
                self.handles[shard].check_and_insert.remote(uniq, _np_u64(hashes))
            )
            keep = [i for i, o in zip(idxs, ok) if o]

        sub = group.take(pa.array(keep, pa.int64())) if keep else None
        out = {
            "url": (sub["url"].to_pylist() if sub else []) + [""],
            "host": (sub["host"].to_pylist() if sub else []) + [""],
            "p_host": (sub["p_host"].to_pylist() if sub else []) + [""],
            "p_seq": (sub["p_seq"].to_pylist() if sub else []) + [n_proc],
            "link_idx": (sub["link_idx"].to_pylist() if sub else []) + [n_docs],
        }
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "host": pa.array(out["host"], pa.string()),
                "p_host": pa.array(out["p_host"], pa.string()),
                "p_seq": pa.array(out["p_seq"], pa.int64()),
                "link_idx": pa.array(out["link_idx"], pa.int32()),
            }
        )


def _seed_frontier(cfg: CrawlConfig, shards) -> pa.Table:
    """processNextUrl over the seed list (Initialisation.hs:97-119)."""
    rows = []
    seen_local = set()
    for idx, s in enumerate(cfg.seeds):
        cu = canonicalise(s)
        if cu is None or not cfg.policy.include.accepts(cu):
            continue
        if cu in seen_local:
            continue
        seen_local.add(cu)
        rows.append((cu, get_domain(cu) or "", "", idx, 0))
    if rows:
        by_shard: dict[int, tuple[list, list]] = {}
        for cu, *_ in rows:
            h = url_hash(cu)
            us, hs = by_shard.setdefault(h % cfg.n_seen_shards, ([], []))
            us.append(cu)
            hs.append(h)
        accepted: dict[str, bool] = {}
        for s, (us, hs) in by_shard.items():
            for u, ok in zip(
                us, ray.get(shards[s].check_and_insert.remote(us, _np_u64(hs)))
            ):
                accepted[u] = ok
        rows = [r for r in rows if accepted.get(r[0], False)]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "p_host": pa.array([r[2] for r in rows], pa.string()),
            "p_seq": pa.array([r[3] for r in rows], pa.int64()),
            "link_idx": pa.array([r[4] for r in rows], pa.int32()),
        },
        schema=FRONTIER_SCHEMA,
    )


def _round_dir(run_dir: str, rnd: int) -> str:
    return os.path.join(run_dir, f"round_{rnd:05d}")


def crawl(
    cfg: CrawlConfig,
    shards=None,
    start_round: int = 0,
    start_frontier_path: str | None = None,
    stored_so_far: int = 0,
) -> CrawlSummary:
    """Run the BFS crawl; resumable via pipelines.checkpoint.resume_crawl."""
    os.makedirs(cfg.run_dir, exist_ok=True)
    summary = CrawlSummary(run_dir=cfg.run_dir, stored=stored_so_far)

    # The fetch pool, the combined-phase pool (0.5 CPU) and the sort-shuffle
    # tasks (1 CPU each) all live in ONE execution; a fetch pool that
    # reserves every CPU starves the shuffle and the round livelocks.
    fetch_concurrency = cfg.fetch_concurrency
    if isinstance(fetch_concurrency, int):
        avail = int(ray.cluster_resources().get("CPU", 4))
        fetch_concurrency = max(1, min(fetch_concurrency, avail - 2))

    if shards is None:
        shards = make_shards(cfg.n_seen_shards, cfg.seen_capacity_per_shard)

    rnd = start_round
    if start_frontier_path is None:
        frontier_tbl = _seed_frontier(cfg, shards)
        frontier_path = os.path.join(cfg.run_dir, "frontier_00000")
        os.makedirs(frontier_path, exist_ok=True)
        pq.write_table(frontier_tbl, os.path.join(frontier_path, "part-0.parquet"))
        frontier_rows = frontier_tbl.num_rows
    else:
        frontier_path = start_frontier_path
        frontier_rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(frontier_path, "*.parquet"))
        )

    while frontier_rows and rnd < cfg.max_rounds:
        rdir = _round_dir(cfg.run_dir, rnd)
        os.makedirs(rdir, exist_ok=True)

        ds = rd.read_parquet(frontier_path)
        ds = ds.map_batches(
            frontier_shard_column,
            batch_format="pyarrow",
            fn_kwargs={"n_fetch_shards": cfg.n_fetch_shards},
        )
        fetched = ds.groupby("shard").map_groups(
            FetchGroup,
            fn_constructor_args=(
                cfg.spec,
                cfg.policy,
                cfg.corpus_path,
                shards,
                cfg.n_seen_shards,
                cfg.run_dir,
                rnd,
                cfg.politeness_delay,
                cfg.record_metrics,
            ),
            batch_format="pyarrow",
            concurrency=fetch_concurrency,
            num_cpus=1,
        )
        # ONE heavy execution per round: fetch groups -> [sort-shuffle
        # barrier] -> combined terminal+candidate groups. The materialized
        # result is metadata-only (next frontier + per-group stat rows);
        # payload/order/log files were already written inside fetch tasks.
        combined = fetched.groupby("sshard").map_groups(
            _CombinedPhase,
            fn_constructor_args=(shards, cfg.n_seen_shards),
            batch_format="pyarrow",
            concurrency=2,
            num_cpus=0.25,
        )
        mat = combined.materialize()

        stat_rows = mat.map_batches(
            lambda t: t.filter(pc.equal(t["url"], "")), batch_format="pyarrow"
        ).take_all()
        n_proc = sum(r["p_seq"] for r in stat_rows)
        n_docs = sum(r["link_idx"] for r in stat_rows)
        summary.fetched += n_proc

        # --- quota accounting (candidates were already inserted — the
        #     oracle inserts them before breaking on quota too) -----------
        stored_before = summary.stored
        if cfg.limit is not None and summary.stored + n_docs > cfg.limit:
            _trim_round_docs(cfg, rnd, cfg.limit - summary.stored)
            summary.stored = cfg.limit
            summary.quota_reached = True
        else:
            summary.stored += n_docs

        next_path = os.path.join(cfg.run_dir, f"frontier_{rnd + 1:05d}")
        os.makedirs(next_path, exist_ok=True)
        frontier_rows = 0
        if not summary.quota_reached:
            survivors = mat.map_batches(
                lambda t: t.filter(pc.invert(pc.equal(t["url"], ""))),
                batch_format="pyarrow",
            )
            frontier_rows = mat.count() - len(stat_rows)
            if frontier_rows:
                survivors.write_parquet(next_path)

        # --- seen deltas: each shard writes its own file -----------------
        ddir = os.path.join(rdir, "seen_delta")
        os.makedirs(ddir, exist_ok=True)
        ray.get([s.write_delta.remote(ddir) for s in shards])

        stored_this_round = (
            n_docs if not summary.quota_reached else max(0, cfg.limit - stored_before)
        )
        stats = {
            "fetched": n_proc,
            "stored": stored_this_round,
            "frontier_next": frontier_rows,
        }
        summary.round_stats.append({"round": rnd, **stats})
        _commit_round(rdir, rnd, stats, next_path)

        frontier_path = next_path
        rnd += 1
        if summary.quota_reached:
            break

    summary.rounds = rnd - start_round
    summary.frontier_exhausted = frontier_rows == 0
    _write_run_manifest(cfg, summary)
    return summary


def _commit_round(rdir: str, rnd: int, stats: dict, next_frontier_path: str) -> None:
    manifest = {
        "round": rnd,
        "stats": stats,
        "next_frontier": next_frontier_path,
        "complete": True,
    }
    tmp = os.path.join(rdir, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(rdir, "MANIFEST.json"))


def _trim_round_docs(cfg: CrawlConfig, rnd: int, room: int) -> None:
    """Quota cut: keep the canonical-order (host, seq) prefix of this
    round's stored docs (deterministic version of Crawl.hs:181-183)."""
    docs_dir = os.path.join(_round_dir(cfg.run_dir, rnd), "docs")
    if not os.path.isdir(docs_dir):
        return
    files = sorted(
        os.path.join(docs_dir, f)
        for f in os.listdir(docs_dir)
        if f.endswith(".parquet")
    )
    if not files:
        return
    table = pa.concat_tables([pq.read_table(f) for f in files])
    table = table.sort_by([("host", "ascending"), ("seq", "ascending")])
    kept = table.slice(0, max(0, room))
    for f in files:
        os.remove(f)
    pq.write_table(kept, os.path.join(docs_dir, "part-trimmed.parquet"))


def _write_run_manifest(cfg: CrawlConfig, summary: CrawlSummary) -> None:
    m = {
        "rounds": summary.rounds,
        "stored": summary.stored,
        "fetched": summary.fetched,
        "quota_reached": summary.quota_reached,
        "frontier_exhausted": summary.frontier_exhausted,
        "round_stats": summary.round_stats,
        "config": {
            "n_pages": cfg.spec.n_pages,
            "n_hosts": cfg.spec.n_hosts,
            "seed": cfg.spec.seed,
            "limit": cfg.limit,
            "n_fetch_shards": cfg.n_fetch_shards,
            "n_seen_shards": cfg.n_seen_shards,
        },
    }
    tmp = os.path.join(cfg.run_dir, "RUN_MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, os.path.join(cfg.run_dir, "RUN_MANIFEST.json"))


def read_crawled(run_dir: str):
    """All stored docs of a run as a Ray Dataset (streaming read)."""
    files = sorted(glob.glob(os.path.join(run_dir, "round_*", "docs", "*.parquet")))
    if not files:
        return rd.from_arrow(pa.table({"url": pa.array([], pa.string())}))
    return rd.read_parquet(files)


def read_order(run_dir: str) -> pa.Table:
    """Canonical crawl order (round, host, seq, url) from checkpoints."""
    rows = []
    for rdir in sorted(glob.glob(os.path.join(run_dir, "round_*"))):
        rnd = int(os.path.basename(rdir).split("_")[1])
        files = sorted(glob.glob(os.path.join(rdir, "order", "*.parquet")))
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        t = t.append_column("round", pa.array([rnd] * t.num_rows, pa.int32()))
        rows.append(t)
    if not rows:
        return pa.table(
            {"url": [], "host": [], "seq": [], "detail": [], "round": []}
        )
    out = pa.concat_tables(rows)
    return out.sort_by(
        [("round", "ascending"), ("host", "ascending"), ("seq", "ascending")]
    )
