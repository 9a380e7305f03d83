"""Round-based BFS crawl driver: the Ray-Data-native re-expression of the
reference's worker/monitor loops (/root/reference/src/Main.hs:22-68,
Crawl.hs:92-185).

Each round is two RAW-Ray-task fan-outs with file-partitioned exchange
(SURVEY.md §3.2, re-planned in round 2 for minimal per-round fixed cost):

    frontier_k/*.parquet  (written by round k-1's combined tasks, one
        |                  file each, row-groups partitioned by host-hash
        |                  fetch shard -> politeness, shuffle 1)
        v  one fetch TASK per shard (per-host FIFO, sub-fetch chains,
        |  cookies snapshot in, docs/order/logs written in place)
    per-seen-shard Arrow meta tables via Ray multi-return (object-store
        |  exchange, shuffle 2 — no files; see stages/fetch.py)
        v  one combined TASK per seen shard (canonical-order terminal
        |  mutations, candidate dedup + insertIfNotDone, delta checkpoint)
    frontier_{k+1}/from_{m}.parquet + MANIFEST

Termination: empty next frontier (with no pending injected seeds), or
stored-doc quota (Main.hs:61-68; quota fires when stored >= limit, matching
oracle.py's `stored_total >= limit` break), or max_rounds.

Scale discipline: both "shuffles" are explicit hash-partitioned file
exchanges — the layout a 100 TB crawl needs for checkpoint lineage anyway —
so a round has no Ray sort, no Ray Data executor spin-up (round 1's
dominant fixed cost: two streaming-executor startups per round capped
scaling efficiency at 0.57; raw ray.remote fan-outs cut the per-round
driver cost to task dispatch + two small ray.gets), and no actor-pool
churn. The driver only ever sees per-shard counter rows and the (tiny)
shared-cookie updates. The ray.get between the stages is the fetch-phase
barrier that keeps the seen-set frozen while trap-guard lookups run
(oracle.py's round-snapshot convention) — it is semantically required, not
an implementation artifact. The quota trim of the crossing round is
two-pass: keys-only read to find the cutoff, then in-place filtering of
only the boundary files (payload bytes of fully-kept shards never move).

Runtime control surface (Service.hs:28-83 equivalents): drop files into
``run_dir/inject/`` between rounds — ``*.urls`` (one seed URL per line,
addUrl, Service.hs:65-69), ``*.patterns`` (one include pattern per line,
addUrlIncludePattern, Service.hs:71-74), and a ``stop`` sentinel
(Service.hs:79-80 HaltingStatus: finish the in-flight round, commit, and
exit with the frontier intact; a later resume continues exactly). URL and
pattern files are consumed at the next round boundary and revive an
exhausted frontier. Durability (ADVICE r2): each consumed file's content
is first copied to ``run_dir/inject_log/r<round>-<name>`` (atomic write,
BEFORE the ``.consumed`` rename), so a crash in the one-round-deferred
commit window — where a rerun's rmtree can erase the injected frontier
rows — replays the injection from the log; pattern widenings are restored
from the log on every resume.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from dataclasses import dataclass, field, replace

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..fetchsim import FetchPolicy
from ..state.seen import make_shards
from ..stages.fetch import (
    FRONTIER_SCHEMA,
    fetch_shard,
    frontier_group_of,
    n_frontier_groups,
    write_docs_group,
    write_frontier_shards,
)
from ..urlkit import IncludePatterns, canonicalise, get_domain, url_hash
from ..webgen import WebSpec

# raw-task wrappers around the stage bodies (one task per shard); the
# combined stage runs as SeenShard.combined_round actor calls
_fetch_task = ray.remote(fetch_shard)
_docs_task = ray.remote(write_docs_group)


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
    # docs-sink partitions per round: each group owns a set of corpus
    # shards and performs only LOCAL payload takes (stages/fetch.py)
    n_docs_groups: int = 32
    # TEST-ONLY fault injection: called as fault_hook(round, shards) at
    # the top of every round so tests can kill a seen-shard actor
    # mid-crawl and exercise checkpoint.run_with_recovery. Never set in
    # production paths.
    fault_hook: object | None = None


@dataclass
class CrawlSummary:
    rounds: int = 0
    stored: int = 0
    fetched: int = 0
    run_dir: str = ""
    frontier_exhausted: bool = False
    quota_reached: bool = False
    halted: bool = False  # stop sentinel consumed (Service.hs HaltingStatus)
    round_stats: list[dict] = field(default_factory=list)
    cookies: dict = field(default_factory=dict)


def _np_u64(vals):
    return np.array(vals, dtype=np.uint64)


def _insert_new_urls(
    cfg: CrawlConfig, shards, urls: list[str], policy: FetchPolicy
) -> list[tuple[str, str, int]]:
    """processNextUrl over a URL list (Initialisation.hs:97-119 /
    Service.hs addUrl): canonicalise -> include gate -> insertIfNotDone.
    Returns surviving (url, host, list_idx) in list order."""
    rows = []
    seen_local = set()
    for idx, s in enumerate(urls):
        cu = canonicalise(s)
        if cu is None or not policy.include.accepts(cu):
            continue
        if cu in seen_local:
            continue
        seen_local.add(cu)
        rows.append((cu, get_domain(cu) or "", idx))
    if not rows:
        return []
    by_shard: dict[int, tuple[list, list]] = {}
    for cu, *_ in rows:
        h = url_hash(cu)
        us, hs = by_shard.setdefault(h % len(shards), ([], []))
        us.append(cu)
        hs.append(h)
    accepted: dict[str, bool] = {}
    for s, (us, hs) in by_shard.items():
        for u, ok in zip(
            us, ray.get(shards[s].check_and_insert.remote(us, _np_u64(hs)))
        ):
            accepted[u] = ok
    return [r for r in rows if accepted.get(r[0], False)]


def _frontier_table(rows: list[tuple[str, str, str, int, int]]) -> pa.Table:
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


def _pending_injections(run_dir: str) -> list[str]:
    idir = os.path.join(run_dir, "inject")
    if not os.path.isdir(idir):
        return []
    return sorted(
        f
        for f in glob.glob(os.path.join(idir, "*"))
        if f.endswith(".urls") or f.endswith(".patterns")
    )


def _widen_patterns(policy: FetchPolicy, lines: list[str]) -> FetchPolicy:
    inc = policy.include
    return replace(
        policy,
        include=IncludePatterns(
            url_patterns=inc.url_patterns | frozenset(lines),
            domain_patterns=inc.domain_patterns,
        ),
    )


def _read_lines(path: str) -> list[str]:
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def _inject_log_dir(run_dir: str) -> str:
    return os.path.join(run_dir, "inject_log")


def _consume_injections(
    cfg: CrawlConfig, shards, policy: FetchPolicy, frontier_dir: str, tag: int
) -> tuple[FetchPolicy, int]:
    """Apply inject files for round ``tag``: seed URLs enter THIS round's
    frontier (p_host="" sorts them first, like round-0 seeds); include
    patterns extend the URL-pattern set for this and later rounds.

    Durability protocol (ADVICE r2 high+medium): each pending file's
    content is copied to ``inject_log/r<tag>-<name>`` with an atomic write
    BEFORE the ``.consumed`` rename, then ALL of this round's log entries
    are applied — fresh consumes and crash/resume replays take the same
    path. A rerun of this round (after a crash anywhere in the deferred
    one-round commit window, whose rmtree may have erased the injected
    frontier rows) re-applies from the log: seen-set membership inserts
    are re-run unconditionally (idempotent, and a resume's rebuilt state
    lacks this round's uncommitted inserts), while the frontier file is
    rewritten only if missing (when it survived, its rows were already
    counted from the lineage)."""
    pending = _pending_injections(cfg.run_dir)
    ilog = _inject_log_dir(cfg.run_dir)
    if pending:
        os.makedirs(ilog, exist_ok=True)
    for path in pending:
        dst = os.path.join(ilog, f"r{tag:05d}-{os.path.basename(path)}")
        tmp = dst + ".tmp"
        with open(path) as src, open(tmp, "w") as out:
            out.write(src.read())
        os.replace(tmp, dst)
        os.replace(path, path + ".consumed")

    n_injected = 0
    logged = glob.glob(os.path.join(ilog, f"r{tag:05d}-*"))
    # config updates apply before new seeds at the same boundary, so an
    # injected URL is include-checked against the widened pattern set
    logged.sort(key=lambda p: (not p.endswith(".patterns"), p))
    for path in logged:
        lines = _read_lines(path)
        if path.endswith(".patterns"):
            policy = _widen_patterns(policy, lines)
        else:
            stem = os.path.basename(path).rsplit(".", 1)[0]  # r00003-name
            origin = f"inject-{stem}"
            out_path = os.path.join(frontier_dir, f"{origin}.parquet")
            survivors = _insert_new_urls(cfg, shards, lines, policy)
            if survivors and not os.path.exists(out_path):
                rows = [
                    (cu, host, "", idx, 0) for cu, host, idx in survivors
                ]
                write_frontier_shards(
                    _frontier_table(rows), frontier_dir,
                    cfg.n_fetch_shards, origin,
                )
                n_injected += len(rows)
    return policy, n_injected


def crawl(
    cfg: CrawlConfig,
    shards=None,
    start_round: int = 0,
    start_frontier_path: str | None = None,
    stored_so_far: int = 0,
    cookies0: dict | None = None,
) -> CrawlSummary:
    """Run the BFS crawl; resumable via pipelines.checkpoint.resume_crawl."""
    os.makedirs(cfg.run_dir, exist_ok=True)
    _check_run_config(cfg)
    summary = CrawlSummary(
        run_dir=cfg.run_dir, stored=stored_so_far, cookies=dict(cookies0 or {})
    )

    if shards is None:
        shards = make_shards(cfg.n_seen_shards, cfg.seen_capacity_per_shard)

    policy = cfg.policy
    # restore pattern widenings consumed by earlier rounds (ADVICE r2
    # high: injections must survive resume — cfg.policy is the ORIGINAL
    # narrow set). Union is idempotent, so the current round's consume
    # re-applying its own entry is harmless.
    for pth in sorted(
        glob.glob(os.path.join(_inject_log_dir(cfg.run_dir), "*.patterns"))
    ):
        policy = _widen_patterns(policy, _read_lines(pth))
    rnd = start_round
    if start_frontier_path is None:
        survivors = _insert_new_urls(cfg, shards, cfg.seeds, policy)
        rows = [(cu, host, "", idx, 0) for cu, host, idx in survivors]
        frontier_path = os.path.join(cfg.run_dir, "frontier_00000")
        os.makedirs(frontier_path, exist_ok=True)
        write_frontier_shards(
            _frontier_table(rows), frontier_path, cfg.n_fetch_shards, "seeds"
        )
        frontier_rows = len(rows)
    else:
        frontier_path = start_frontier_path
        frontier_rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(frontier_path, "*.parquet"))
        )

    import time as _time

    # crawl-constant context shared by every task of every round: put ONCE
    # (broadcast), not re-serialized per task
    # corpus routing for the docs-group partitioner: sharded corpus ->
    # precomputed host -> corpus-shard array (hashed once per host here,
    # not once per doc in every task); flat corpus -> None (page-id range)
    corpus_meta_path = os.path.join(cfg.corpus_path, "meta.json")
    if os.path.isdir(cfg.corpus_path) and os.path.exists(corpus_meta_path):
        with open(corpus_meta_path) as f:
            n_corpus_shards = json.load(f)["n_shards"]
        from ..webgen import shard_of_host

        corpus_shard_of_host = [
            shard_of_host(h, n_corpus_shards) for h in range(cfg.spec.n_hosts)
        ]
    else:
        corpus_shard_of_host = None

    def _ctx_refs(pol: FetchPolicy):
        base = dict(
            spec=cfg.spec,
            policy=pol,
            corpus_path=cfg.corpus_path,
            seen_handles=shards,
            n_seen_shards=cfg.n_seen_shards,
            n_fetch_shards=cfg.n_fetch_shards,
            n_docs_groups=cfg.n_docs_groups,
            corpus_shard_of_host=corpus_shard_of_host,
            run_dir=cfg.run_dir,
            politeness_delay=cfg.politeness_delay,
            record_metrics=cfg.record_metrics,
            verify_payload=cfg.verify_payload,
        )
        return ray.put(base)

    ctx_ref = _ctx_refs(policy)
    # previous round's combined multi-returns: per seen shard, [stats_ref,
    # frontier_tbl_ref(shard 0), ..., frontier_tbl_ref(shard S-1)]. The
    # happy-path frontier exchange rides the object store; the parquet
    # frontier files written alongside are resume lineage only.
    prev_comb_rets: list | None = None
    # (rdir, rnd, stats, next_path, cookies, docs_refs) awaiting manifest
    pending_commit: tuple | None = None

    while rnd < cfg.max_rounds and (
        frontier_rows or _pending_injections(cfg.run_dir)
    ):
        if cfg.limit is not None and summary.stored >= cfg.limit:
            # quota already satisfied (resume of a quota-completed run):
            # do NOT run another round — it would fetch the entire
            # remaining frontier, then trim every doc to room 0, leaving
            # order/delta artifacts and inflated counters an undisturbed
            # run never produces (review r5: byte-identical-resume
            # invariant)
            summary.quota_reached = True
            break
        # stop verb (Service.hs:79-80 HaltingStatus): checked at the round
        # boundary — the previous round is complete; commit what is
        # pending (after the loop) and exit with the frontier intact so a
        # resume continues exactly where the stop landed
        stop_f = os.path.join(cfg.run_dir, "inject", "stop")
        if os.path.exists(stop_f):
            os.replace(stop_f, stop_f + ".consumed")
            summary.halted = True
            break
        _t_round = _time.time()
        if cfg.fault_hook is not None:
            cfg.fault_hook(rnd, shards)
        rdir = _round_dir(cfg.run_dir, rnd)
        next_path = os.path.join(cfg.run_dir, f"frontier_{rnd + 1:05d}")
        # a crashed (uncommitted) attempt at this round may have left
        # partial artifacts under different names (ADVICE r1): start clean
        if os.path.isdir(rdir):
            shutil.rmtree(rdir)
        if os.path.isdir(next_path):
            shutil.rmtree(next_path)
        os.makedirs(rdir, exist_ok=True)

        # runtime URL/pattern injection (Service.hs addUrl/addUrlIncludePattern)
        new_policy, n_injected = _consume_injections(
            cfg, shards, policy, frontier_path, rnd
        )
        if new_policy is not policy:
            policy = new_policy
            ctx_ref = _ctx_refs(policy)
        frontier_rows += n_injected
        if n_injected:
            # injected rows exist only in the frontier files: fall back to
            # the file path for this round so fetch tasks see them
            prev_comb_rets = None
        if frontier_rows == 0:
            # injections yielded nothing new: drop the empty round dir
            shutil.rmtree(rdir, ignore_errors=True)
            break

        # --- fetch stage: one raw task per fetch shard. Each task has
        #     1 + n_docs_groups + n_seen_shards returns: stats, one docs-
        #     metadata table per docs group (partitioned by the landed
        #     page's corpus shard), then one meta table per seen shard
        #     (the fetch->combined exchange) — all via object store
        csnap = tuple(sorted(summary.cookies.items()))
        G = cfg.n_docs_groups
        # BFS-drain rounds have tiny frontiers: fold shards into fewer
        # tasks (~400 URLs each) so a 50-URL round costs a handful of
        # task dispatches, not n_fetch_shards x 2. A folded task receives
        # the object-store frontier refs of EVERY shard in its group
        # (round-3 change: the old file fallback made each folded round
        # open n_shards x n_files frontier parquets — ~230 core-s per
        # sf0.1 crawl, and a serial multi-second tail in the drain
        # rounds). Grouping is a pure function of frontier_rows, so
        # reruns and resumes regroup identically.
        # Upper cap 128: a 256-task round pays ~2.6 ms driver submission
        # and ~32 ms of multi-return object creation PER TASK (65 returns
        # x ~0.5 ms); folding big rounds 256 -> 128 tasks halves that
        # fixed cost while per-task work (~1-3k URLs) still swamps skew.
        # The cap is a constant — NOT derived from the cluster size — so
        # the job stays bit-identical across cpu levels (scaling
        # protocol) and regroups identically on resume.
        n_groups = min(cfg.n_fetch_shards, 128, max(1, frontier_rows // 400))
        if n_groups == cfg.n_fetch_shards:
            task_shards = [[s] for s in range(cfg.n_fetch_shards)]
        else:
            task_shards = [
                list(range(g, cfg.n_fetch_shards, n_groups))
                for g in range(n_groups)
            ]
        # frontier refs arrive as per-GROUP table-ref PACKS (stages/
        # fetch.py n_frontier_groups): one ray.put per frontier group
        # wrapping that group's table ref from every combined actor.
        # Tasks sharing a frontier group reuse the identical pack object,
        # so the driver serializes each group's n_seen_shards refs once
        # per round instead of once per task. A heavily-folded task would
        # still unwrap refs for many groups x n_seen_shards — past ~512
        # their in-task resolution costs more than the (batched,
        # one-open-per-file) lineage read.
        max_gs = max(
            len({frontier_group_of(s, cfg.n_fetch_shards) for s in grp})
            for grp in task_shards
        )
        use_refs = (
            prev_comb_rets is not None
            and max_gs * cfg.n_seen_shards <= 512
        )
        if use_refs:
            fpacks = [
                ray.put([r[1 + g] for r in prev_comb_rets])
                for g in range(n_frontier_groups(cfg.n_fetch_shards))
            ]

        def _task_packs(grp):
            gs = sorted({frontier_group_of(s, cfg.n_fetch_shards) for s in grp})
            return [fpacks[g] for g in gs]
        # round-start guard snapshots: each seen actor publishes its
        # sorted url-hash array to the object store. Actor-mailbox
        # ordering puts these after the previous round's combined_round,
        # so the arrays are exactly the state the fetch phase must see
        # (the seen set is frozen until this round's combined). Passed to
        # fetch tasks as refs-in-a-list: resolved lazily, per shard, by
        # the first trap-guard query that needs one — no fetch task ever
        # blocks on a seen actor again. The ref list itself ships as ONE
        # ray.put object: serializing 32 refs into every task invocation
        # measured ~1 ms/task of driver-serial submission time.
        snap_pack = ray.put([s.snapshot_hashes.remote() for s in shards])
        fetch_rets = [
            _fetch_task.options(
                num_returns=1 + G + cfg.n_seen_shards
            ).remote(
                grp if len(grp) > 1 else grp[0],
                ctx_ref, rnd, frontier_path, csnap, snap_pack,
                _task_packs(grp) if use_refs else None,
            )
            for grp in task_shards
        ]
        # payload persistence (corpus take + verify + docs parquet): one
        # task per DOCS GROUP, fed its metadata return of every fetch
        # task — payload takes stay local to the group's corpus shards;
        # runs under the fetch straggler's tail, the combined phase, and
        # the next round's fetch; the round commits (below) only after
        # these are durable
        docs_refs = [
            _docs_task.remote(
                g, ctx_ref, rnd, *[fr[1 + g] for fr in fetch_rets]
            )
            for g in range(G)
        ]
        # --- combined terminal+candidate stage: one combined_round actor
        #     call per seen shard, fed every fetch task's meta-list ref.
        #     Submitted immediately — those object refs ARE the fetch-phase
        #     barrier (no combined call can start before every fetch task
        #     finished, so the seen set stays frozen during the fetch
        #     phase), and the driver's stats processing below overlaps
        #     with combined execution instead of gating it.
        comb_rets = [
            shards[m].combined_round.options(
                num_returns=1 + n_frontier_groups(cfg.n_fetch_shards)
            ).remote(
                cfg.n_fetch_shards, cfg.run_dir, rnd, next_path,
                *[r[1 + G + m] for r in fetch_rets],
            )
            for m in range(cfg.n_seen_shards)
        ]

        stats1 = ray.get([r[0] for r in fetch_rets])
        _t_fetch = _time.time() - _t_round
        n_proc = sum(r["n_proc"] for r in stats1)
        n_docs = sum(r["n_docs"] for r in stats1)
        summary.fetched += n_proc

        # --- quota accounting (oracle.py:157 'stored_total >= limit';
        #     candidates still get inserted below — the oracle inserts them
        #     before breaking on quota too) ------------------------------
        stored_before = summary.stored
        new_total = stored_before + n_docs
        if cfg.limit is not None and new_total >= cfg.limit:
            if new_total > cfg.limit:
                ray.get(docs_refs)  # trim needs this round's docs durable
                _trim_round_docs(cfg, rnd, cfg.limit - stored_before)
            summary.stored = cfg.limit
            summary.quota_reached = True
        else:
            summary.stored = new_total

        # --- shared cookies, applied in canonical (host, seq) order
        #     (shareCookies at round end — the serialization oracle.py uses)
        for _host, _seq, name, val in sorted(
            t for r in stats1 for t in r["shared_cookies"]
        ):
            summary.cookies[name] = val

        stats2 = ray.get([r[0] for r in comb_rets])
        frontier_rows = sum(r["n_new"] for r in stats2)
        prev_comb_rets = comb_rets
        _t_combined = _time.time() - _t_round - _t_fetch

        stored_this_round = summary.stored - stored_before
        f_secs = [r["sec"] for r in stats1]
        c_secs = [r["sec"] for r in stats2]
        stats = {
            "fetched": n_proc,
            "stored": stored_this_round,
            "frontier_next": frontier_rows,
            "sec_fetch": round(_t_fetch, 3),
            "sec_combined": round(_t_combined, 3),
            "sec_round": round(_time.time() - _t_round, 3),
            # straggler diagnostics: per-task wall time sum/max per stage
            "fetch_task_sum": round(sum(f_secs), 3),
            "fetch_task_max": round(max(f_secs), 3),
            "comb_task_sum": round(sum(c_secs), 3),
            "comb_task_max": round(max(c_secs), 3),
            "fetch_nodes": sorted({r.get("node", "") for r in stats1} - {""}),
            "fetch_phases": {
                k: round(sum(r.get(k, 0.0) for r in stats1), 2)
                for k in (
                    "t_read", "t_proc", "t_docs", "t_meta", "t_guard",
                    "n_guard", "t_cpu",
                )
            },
            "fetch_spans": [
                (round(r["t0"], 3), round(r["t1"], 3)) for r in stats1
            ],
            "comb_spans": [
                (round(r["t0"], 3), round(r["t1"], 3)) for r in stats2
            ],
            "comb_phases": {
                k: round(sum(r.get(k, 0.0) for r in stats2), 2)
                for k in ("t_read", "t_mut", "t_cand", "t_write", "t_delta")
            },
        }
        stats["round"] = rnd
        # append the SAME dict pending_commit holds — docs_spans is added
        # to it when the round commits, and must reach RUN_MANIFEST too
        summary.round_stats.append(stats)
        # commit of the PREVIOUS round: its docs tasks finished while this
        # round ran; a crash before a commit just reruns that round from
        # its frontier files (pipelines/checkpoint.py), so deferring the
        # manifest one round keeps resume exact while letting payload
        # writes overlap execution
        if pending_commit is not None:
            p_rdir, p_rnd, p_stats, p_next, p_cookies, p_docs = pending_commit
            dstats = ray.get(p_docs)
            p_stats["docs_spans"] = [
                (round(d["t0"], 3), round(d["t1"], 3)) for d in dstats
            ]
            p_stats["docs_phases"] = {
                k: round(sum(d.get(k, 0.0) for d in dstats), 2)
                for k in ("t_take", "t_verify", "t_render", "t_write")
            }
            _commit_round(p_rdir, p_rnd, p_stats, p_next, p_cookies)
        pending_commit = (
            rdir, rnd, stats, next_path, dict(summary.cookies), docs_refs
        )

        frontier_path = next_path
        _write_status(cfg.run_dir, "running", rnd, frontier_rows, summary)
        rnd += 1
        if summary.quota_reached:
            break

    if pending_commit is not None:
        p_rdir, p_rnd, p_stats, p_next, p_cookies, p_docs = pending_commit
        dstats = ray.get(p_docs)
        p_stats["docs_spans"] = [
            (round(d["t0"], 3), round(d["t1"], 3)) for d in dstats
        ]
        p_stats["docs_phases"] = {
            k: round(sum(d.get(k, 0.0) for d in dstats), 2)
            for k in ("t_take", "t_verify", "t_render", "t_write")
        }
        _commit_round(p_rdir, p_rnd, p_stats, p_next, p_cookies)

    if not summary.halted:
        # a stop dropped while the final round was in flight was never
        # consumed (the loop exited on exhaustion/quota first); left in
        # place it would silently halt a FUTURE resume at round 0, before
        # that resume's injections are applied (review r5). The crawl has
        # already stopped, so the sentinel's intent is satisfied.
        stale_stop = os.path.join(cfg.run_dir, "inject", "stop")
        if os.path.exists(stale_stop):
            os.replace(stale_stop, stale_stop + ".consumed")

    summary.rounds = rnd - start_round
    summary.frontier_exhausted = frontier_rows == 0
    state = (
        "halted" if summary.halted
        else "quota" if summary.quota_reached
        else "exhausted" if summary.frontier_exhausted
        else "max_rounds"
    )
    _write_status(cfg.run_dir, state, rnd - 1, frontier_rows, summary)
    _write_run_manifest(cfg, summary)
    return summary


def _check_run_config(cfg) -> None:
    """Pin the run's IDENTITY-DEFINING config at first crawl() entry and
    REFUSE a resume under a different one (review r5): restoring seen
    deltas written with 8 shards into a 16-shard routing silently
    re-fetches done URLs (duplicate docs, non-byte-identical run), and a
    different web spec is a different universe entirely. Task-granularity
    knobs (fetch shards, concurrency, limits) may legitimately change
    across resumes and are NOT pinned."""
    fp = {
        "n_seen_shards": cfg.n_seen_shards,
        "n_pages": cfg.spec.n_pages,
        "n_hosts": cfg.spec.n_hosts,
        "seed": cfg.spec.seed,
    }
    path = os.path.join(cfg.run_dir, "run_config.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        if prev != fp:
            raise ValueError(
                f"run_dir {cfg.run_dir} was created with {prev}; resuming "
                f"with {fp} would corrupt the seen set — use a fresh "
                "run_dir or restore the original settings"
            )
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(fp, f)
    os.replace(tmp, path)


def _write_status(run_dir: str, state: str, rnd: int, frontier_rows: int,
                  summary: CrawlSummary) -> None:
    """Live status surface (Service.hs:50-63 status/queueSize): refreshed
    at every round boundary while the crawl runs, not just at commit —
    readable by an operator mid-run. Atomic replace; no reader lock."""
    s = {
        "state": state,  # running | halted | quota | exhausted | max_rounds
        "round": rnd,
        "queue_size": frontier_rows,
        "stored": summary.stored,
        "fetched": summary.fetched,
        "cookies": len(summary.cookies),
    }
    tmp = os.path.join(run_dir, "STATUS.json.tmp")
    with open(tmp, "w") as f:
        json.dump(s, f)
    os.replace(tmp, os.path.join(run_dir, "STATUS.json"))


def read_status(run_dir: str) -> dict | None:
    """The last written live status of a run (None before round 0)."""
    try:
        with open(os.path.join(run_dir, "STATUS.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _commit_round(
    rdir: str, rnd: int, stats: dict, next_frontier_path: str, cookies: dict
) -> None:
    manifest = {
        "round": rnd,
        "stats": stats,
        "next_frontier": next_frontier_path,
        "cookies": dict(cookies),
        "complete": True,
    }
    tmp = os.path.join(rdir, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(rdir, "MANIFEST.json"))


def _trim_round_docs(cfg: CrawlConfig, rnd: int, room: int) -> None:
    """Quota cut: keep the canonical-order (host, seq) prefix of this
    round's stored docs (deterministic version of Crawl.hs:181-183).

    Two-pass and payload-free (VERDICT r1 #7): pass 1 reads ONLY the
    (host, seq) key columns to rank rows; pass 2 rewrites just the files
    that straddle the cutoff — fully-kept files are untouched, fully-cut
    files are removed, so payload bytes of kept shards never move."""
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
    room = max(0, room)
    # pass 1: keys only, one numpy lexsort (VERDICT r2 #3 — the Python
    # sorted()/`in kept` pair made the quota round O(rows) Python)
    import pandas as pd

    tabs = [pq.read_table(f, columns=["host", "seq"]) for f in files]
    counts = [t.num_rows for t in tabs]
    keys = pa.concat_tables(tabs)
    host_codes, _ = pd.factorize(
        keys["host"].combine_chunks().to_numpy(zero_copy_only=False), sort=True
    )
    seqs = keys["seq"].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.lexsort((seqs, host_codes))
    kept_mask = np.zeros(len(host_codes), dtype=bool)
    kept_mask[order[:room]] = True
    # pass 2: rewrite only boundary files
    row_cursor = 0
    for f, n in zip(files, counts):
        mask = kept_mask[row_cursor : row_cursor + n]
        row_cursor += n
        n_keep = int(mask.sum())
        if n_keep == n:
            continue  # fully kept: payload untouched
        if n_keep == 0:
            os.remove(f)
            continue
        t = pq.read_table(f)
        t = t.take(pa.array(np.flatnonzero(mask), pa.int64()))
        tmp = f + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, f)


def _write_run_manifest(cfg: CrawlConfig, summary: CrawlSummary) -> None:
    m = {
        "rounds": summary.rounds,
        "stored": summary.stored,
        "fetched": summary.fetched,
        "quota_reached": summary.quota_reached,
        "frontier_exhausted": summary.frontier_exhausted,
        "halted": summary.halted,
        "cookies": dict(summary.cookies),
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
        # full docs schema, typed and empty — a url-only fallback diverged
        # from the non-empty path's schema (review r5)
        schema = pa.schema(
            [
                ("url", pa.string()),
                ("redirect_chain", pa.list_(pa.string())),
                ("content", pa.binary()),
                ("worker_id", pa.string()),
                ("round", pa.int32()),
                ("host", pa.string()),
                ("seq", pa.int64()),
                ("hops", pa.int32()),
                ("image_id", pa.string()),
                ("image_bytes", pa.binary()),
                ("caption", pa.string()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
                ("phash", pa.int64()),
            ]
        )
        return rd.from_arrow(schema.empty_table())
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
        # typed empty table — the bare-list fallback produced null-typed
        # columns, breaking schema-sensitive consumers on the empty-run
        # edge (review r5)
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "host": pa.array([], pa.string()),
                "seq": pa.array([], pa.int64()),
                "detail": pa.array([], pa.string()),
                "round": pa.array([], pa.int32()),
            }
        )
    out = pa.concat_tables(rows)
    return out.sort_by(
        [("round", "ascending"), ("host", "ascending"), ("seq", "ascending")]
    )
