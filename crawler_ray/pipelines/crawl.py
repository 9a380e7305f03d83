"""Round-based BFS crawl driver: the Ray-Data re-expression of the
reference's worker/monitor loops (/root/reference/src/Main.hs:22-68,
Crawl.hs:92-185).

Each round is two task fan-outs with file-partitioned exchange
(SURVEY.md §3.2, re-planned for fixed-cost rounds):

    frontier_k/shard_{s}-*.parquet  (written by round k-1, host-hash
        |                            partitioned -> politeness, shuffle 1)
        v  one fetch task per shard (per-host FIFO, sub-fetch chains,
        |  docs/order/logs written in place; payloads never move again)
    round_k/meta/ss_{m}-from_{s}.parquet  (seen-shard partitioned,
        |                                  shuffle 2)
        v  one combined task per seen shard (terminal mutations, then
        |  candidate dedup + insertIfNotDone on the shard actor)
    frontier_{k+1}/shard_{s}-from_{m}.parquet + seen deltas + MANIFEST

Termination: empty next frontier, or stored-doc quota (Main.hs:61-68), or
max_rounds.

Scale discipline: both "shuffles" are explicit hash-partitioned file
exchanges — the layout a 100 TB crawl needs for checkpoint lineage anyway —
so a round has no Ray sort and no actor-pool churn; the driver only ever
sees per-shard counter rows. The ``take_all`` between the stages is the
fetch-phase barrier that keeps the seen-set frozen while trap-guard
lookups run (oracle.py's round-snapshot convention). The quota trim of
the final round is the only payload-sorting step and touches at most
``limit`` rows.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..fetchsim import FetchPolicy
from ..state.seen import make_shards
from ..stages.fetch import (
    FRONTIER_SCHEMA,
    combined_shard_batch,
    fetch_shard_batch,
    write_frontier_shards,
)
from ..urlkit import canonicalise, get_domain, url_hash
from ..webgen import WebSpec

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
    # parallelism is one task per fetch shard (n_fetch_shards); this field
    # is kept for CLI/API compatibility but no longer drives a pool
    fetch_concurrency: int | tuple = 4
    politeness_delay: float = 0.0
    record_metrics: bool = False
    # run the per-row payload invariant inline in the fetch stage
    verify_payload: bool = False
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

    if shards is None:
        shards = make_shards(cfg.n_seen_shards, cfg.seen_capacity_per_shard)

    rnd = start_round
    if start_frontier_path is None:
        frontier_tbl = _seed_frontier(cfg, shards)
        frontier_path = os.path.join(cfg.run_dir, "frontier_00000")
        os.makedirs(frontier_path, exist_ok=True)
        write_frontier_shards(frontier_tbl, frontier_path, cfg.n_fetch_shards, "seeds")
        frontier_rows = frontier_tbl.num_rows
    else:
        frontier_path = start_frontier_path
        frontier_rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(frontier_path, "*.parquet"))
        )

    import time as _time

    while frontier_rows and rnd < cfg.max_rounds:
        _t_round = _time.time()
        rdir = _round_dir(cfg.run_dir, rnd)
        os.makedirs(rdir, exist_ok=True)
        next_path = os.path.join(cfg.run_dir, f"frontier_{rnd + 1:05d}")

        # --- fetch stage: one task per fetch shard; all exchange through
        #     partitioned files (see stages/fetch.py module doc) ----------
        stats1 = (
            rd.from_items(
                list(range(cfg.n_fetch_shards)),
                override_num_blocks=cfg.n_fetch_shards,
            )
            .map_batches(
                fetch_shard_batch,
                batch_format="pyarrow",
                fn_kwargs=dict(
                    spec=cfg.spec,
                    policy=cfg.policy,
                    corpus_path=cfg.corpus_path,
                    seen_handles=shards,
                    n_seen_shards=cfg.n_seen_shards,
                    run_dir=cfg.run_dir,
                    round_idx=rnd,
                    frontier_dir=frontier_path,
                    politeness_delay=cfg.politeness_delay,
                    record_metrics=cfg.record_metrics,
                    verify_payload=cfg.verify_payload,
                ),
            )
            .take_all()
        )
        _t_fetch = _time.time() - _t_round
        n_proc = sum(r["n_proc"] for r in stats1)
        n_docs = sum(r["n_docs"] for r in stats1)
        summary.fetched += n_proc

        # --- quota accounting (candidates still get inserted below — the
        #     oracle inserts them before breaking on quota too) -----------
        stored_before = summary.stored
        if cfg.limit is not None and summary.stored + n_docs > cfg.limit:
            _trim_round_docs(cfg, rnd, cfg.limit - summary.stored)
            summary.stored = cfg.limit
            summary.quota_reached = True
        else:
            summary.stored += n_docs

        # --- combined terminal+candidate stage: one task per seen shard;
        #     the take_all() above is the fetch-phase barrier -------------
        stats2 = (
            rd.from_items(
                list(range(cfg.n_seen_shards)),
                override_num_blocks=cfg.n_seen_shards,
            )
            .map_batches(
                combined_shard_batch,
                batch_format="pyarrow",
                fn_kwargs=dict(
                    seen_handles=shards,
                    n_seen_shards=cfg.n_seen_shards,
                    n_fetch_shards=cfg.n_fetch_shards,
                    run_dir=cfg.run_dir,
                    round_idx=rnd,
                    next_frontier_dir=next_path,
                ),
            )
            .take_all()
        )
        frontier_rows = sum(r["n_new"] for r in stats2)
        _t_combined = _time.time() - _t_round - _t_fetch

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
            "sec_fetch": round(_t_fetch, 3),
            "sec_combined": round(_t_combined, 3),
            "sec_round": round(_time.time() - _t_round, 3),
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
