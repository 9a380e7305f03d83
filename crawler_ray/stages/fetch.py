"""Fetch + combined stages: host-sharded, politeness-preserving,
file-partitioned, driven as RAW Ray task fan-outs.

Frontier rows are partitioned by ``shard = url_hash(host) % n_fetch_shards``
(SURVEY.md §2.4 T1): every URL of a host lands in exactly ONE shard, each
shard is processed by ONE task sequentially, so the reference's structural
politeness invariant — at most one in-flight request per host at any time
(/root/reference/src/PoliteQueue.hs:34-64, one thread owns a domain) —
holds under data parallelism. Within a shard, rows are processed in
per-host FIFO discovery order; an optional ``politeness_delay`` enforces a
min interval between fetches to the same host (the reference has no timer;
concurrency cap 1 is its only budget).

Data exchange, round-2 layout (re-planned after measuring round 1):

- frontier (combined -> next round's fetch; ALSO the resume lineage):
  ONE parquet file per combined task, row-group-aligned on a ``shard``
  column — fetch task ``s`` prunes to its rows via row-group statistics.
  The round-1 layout (one file per (fetch shard, seen shard) pair, ~8k
  tiny ext4 creates+renames per round) cost more core-seconds than the
  crawl's real work and caused journal-flush stalls.
- meta (fetch -> combined, intra-round only): Arrow tables through the
  OBJECT STORE — fetch task ``s`` multi-returns (stats, docs_g0 ..
  docs_g{G-1}, meta_ss0 .. meta_ss{M-1}) with
  ``num_returns=1+n_docs_groups+n_seen_shards``; combined actor ``m``
  receives exactly the (1+G+m)-th return ref of every fetch task
  (per-consumer granularity: a consumer deserializes only its own slice,
  never the whole exchange). No files: resume reruns an uncommitted
  round from its frontier files, so meta needs no durability.
- the docs returns carry METADATA ONLY — url/chain/host/seq/hops/
  page_id, never the content body. The body is a pure function of
  (spec, page_id), so the docs task re-renders it instead of shipping
  ~1 KB x stored-docs through plasma every round (round-3 change: the
  measured 32-worker core-second inflation tracked shared plasma/disk
  byte volume, VERDICT r2 #1).
- docs metadata is partitioned by the LANDED page's CORPUS shard (G
  group returns per fetch task), not by fetch shard: payload attach is
  co-partitioned with payload storage. Round-3 change: with docs tasks
  keyed by fetch shard, the ~25% of stored docs that land cross-host
  (redirect/meta/form/direction chains) each paid a full row-group read
  in a foreign corpus partition — 0.5-1.1 ms/row and ~170 GB of read
  amplification per sf0.1 crawl, the single largest shared-memory-bus
  load behind the 32-worker core-second inflation. Grouped by corpus
  shard, those rows fold into the covering-row-group reads the owning
  group performs anyway (~4 us/row marginal).
- docs / order / logs / metrics / seen deltas: per-shard partition files
  per round (checkpoint lineage + the payload sink).

The per-round fan-outs are plain ``@ray.remote`` tasks (one per shard)
instead of Ray Data executions — the streaming-executor startup (~seconds
x 2 executions x rounds) was the dominant unscalable cost behind the
round-1 scaling-efficiency miss (VERDICT r1 #1); raw tasks cut the
per-round fixed cost to task dispatch (~ms).

Seen-set mutation convention (oracle.py; ADVICE r1 canonical-order fix):
each outcome emits its terminal mutations TAGGED with the outcome's
canonical key — stored: (host, seq, 0)=unconditional delete of the frontier
URL + (host, seq, j)=complete j-th chain element; failed: (host, seq, 0)=
mark failed. The combined task sorts all mutations of its seen shard by
that key and replays them in order, exactly the oracle's interleaving.

Per-worker-process state (the reference's shared HTTP ``Manager``,
Crawl.hs:42-44) lives in a module-level cache: the corpus handle is opened
once per Ray worker process and reused across tasks and rounds.
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..fetchsim import process_url
from ..sources.corpus import open_corpus
from ..urlkit import get_domain, url_hash

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("p_host", pa.string()),
        ("p_seq", pa.int64()),
        ("link_idx", pa.int32()),
    ]
)

# metadata rows exchanged fetch -> combined stage (per seen-shard files):
# kind 'mut' rows carry a terminal mutation (op: 0=delete, 2=completed,
# 3=failed) keyed by the outcome's canonical (p_host, p_seq, link_idx=op
# index); kind 'link' rows are candidate URLs keyed by discovery key.
META_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # mut | link
        ("url", pa.string()),
        ("host", pa.string()),
        ("p_host", pa.string()),
        ("p_seq", pa.int64()),
        ("link_idx", pa.int32()),
        ("op", pa.int8()),
        # blake2b url hash, computed ONCE here in the (parallel) fetch
        # task — the fetch already hashes every meta row for seen-shard
        # routing, and shipping the value saves the combined actors from
        # re-hashing the whole round's rows on the round-end critical
        # path (round 4; ~0.4 s per shard per crawl in the profile)
        ("uhash", pa.uint64()),
    ]
)

_CORPUS_CACHE: dict[str, object] = {}


def _corpus(path: str):
    """Per-worker-process corpus handle (opened once, reused across tasks)."""
    store = _CORPUS_CACHE.get(path)
    if store is None:
        store = open_corpus(path)
        _CORPUS_CACHE[path] = store
    return store


def _atomic_write(path: str, table: pa.Table) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _host_shards(table: pa.Table, n_fetch_shards: int) -> np.ndarray:
    """Vectorized shard = url_hash(host) % n: hosts repeat heavily, so
    factorize once and hash only the UNIQUE hosts (VERDICT r2 #3 — the
    per-row Python url_hash loop ran in every combined actor every
    round)."""
    import pandas as pd

    hosts = table["host"].combine_chunks().to_numpy(zero_copy_only=False)
    codes, uniques = pd.factorize(hosts)
    shard_of_unique = np.fromiter(
        (url_hash(h) % n_fetch_shards for h in uniques),
        dtype=np.int64,
        count=len(uniques),
    )
    return shard_of_unique[codes]


def _shard_sorted(
    table: pa.Table, n_fetch_shards: int
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """(table stably sorted by shard, sorted shard column, bounds) where
    rows of shard s are slice [bounds[s], bounds[s+1])."""
    shard = _host_shards(table, n_fetch_shards)
    order = np.argsort(shard, kind="stable")
    sorted_shard = shard[order]
    bounds = np.searchsorted(sorted_shard, np.arange(n_fetch_shards + 1))
    return table.take(pa.array(order, pa.int64())), sorted_shard, bounds


def n_frontier_groups(n_fetch_shards: int) -> int:
    """Frontier-exchange group count: every Ray multi-return costs ~0.5 ms
    of object-store create/bookkeeping, so combined actors return one
    table per GROUP of fetch shards (with an explicit ``shard`` column for
    the consumer-side filter) instead of one per shard — 257 returns per
    combined call measured ~1 s of wall per drain round at 32 actors."""
    return min(32, n_fetch_shards)


def frontier_group_of(shard: int, n_fetch_shards: int) -> int:
    gsize = -(-n_fetch_shards // n_frontier_groups(n_fetch_shards))
    return shard // gsize


def partition_frontier_groups(
    table: pa.Table, n_fetch_shards: int
) -> list[pa.Table]:
    """One table per frontier GROUP, rows carrying their exact ``shard``
    as a column (consumers filter; see n_frontier_groups)."""
    taken, sorted_shard, bounds = _shard_sorted(table, n_fetch_shards)
    taken = taken.append_column("shard", pa.array(sorted_shard, pa.int32()))
    ng = n_frontier_groups(n_fetch_shards)
    gsize = -(-n_fetch_shards // ng)
    out = []
    for g in range(ng):
        lo = bounds[min(g * gsize, n_fetch_shards)]
        hi = bounds[min((g + 1) * gsize, n_fetch_shards)]
        out.append(taken.slice(lo, hi - lo))
    return out


def write_frontier_shards(
    table: pa.Table, frontier_dir: str, n_fetch_shards: int, origin: str
) -> None:
    """Partition frontier rows by host-hash fetch shard (the explicit
    'shuffle 1') into ONE file per writer, row-group-aligned per shard.

    Round-2 layout change: one file per (origin) with a ``shard`` column
    and one parquet row group per shard, instead of one file per (shard,
    origin) pair — measured at sandbox scale, the old layout's
    n_fetch_shards x n_seen_shards tiny files per round (~8k creates +
    renames on ext4) cost more core-seconds than the crawl's real work and
    triggered journal-flush stalls. Fetch task ``s`` prunes to its rows
    via row-group statistics (filters=[('shard','=',s)])."""
    os.makedirs(frontier_dir, exist_ok=True)
    taken, sorted_shard, bounds = _shard_sorted(table, n_fetch_shards)
    taken = taken.append_column("shard", pa.array(sorted_shard, pa.int32()))
    path = os.path.join(frontier_dir, f"{origin}.parquet")
    tmp = path + ".tmp"
    writer = pq.ParquetWriter(tmp, taken.schema)
    for s in range(n_fetch_shards):
        n = bounds[s + 1] - bounds[s]
        if n:  # one row group per shard -> stat pruning
            writer.write_table(taken.slice(bounds[s], n))
    writer.close()
    os.replace(tmp, path)


def read_frontier_shard(frontier_dir: str, shard: int) -> pa.Table | None:
    """Rows of one fetch shard across all frontier files (row-group
    pruned via the shard column's statistics)."""
    return read_frontier_group(frontier_dir, [shard])


def read_frontier_group(frontier_dir: str, shards) -> pa.Table | None:
    """Rows of a GROUP of fetch shards across all frontier files — each
    file is opened ONCE with a row-group-pruned ``shard in (...)`` filter
    (a folded drain round's task used to open every file once PER shard:
    n_shards x n_files reads per round cost more than the round's fetch
    work, VERDICT r2 scaling audit)."""
    files = sorted(glob.glob(os.path.join(frontier_dir, "*.parquet")))
    shard_list = list(shards)
    parts = []
    for f in files:
        t = pq.read_table(f, filters=[("shard", "in", shard_list)])
        if t.num_rows:
            parts.append(t.drop_columns(["shard"]))
    if not parts:
        return None
    return pa.concat_tables(parts)


def fetch_shard(
    shards_of_task,
    ctx: dict,
    round_idx: int,
    frontier_dir: str,
    cookies: tuple,
    snap_refs,
    frontier_packs=None,
) -> dict:
    """Process one GROUP of fetch shards' frontier rows (raw Ray task
    body). ``shards_of_task`` is an int (one shard — the usual case) or a
    list of shard ids: when a BFS-drain round's frontier is tiny, the
    driver folds many shards into few tasks so per-round latency is task
    dispatch for a handful of tasks, not n_fetch_shards. Folding is safe
    for politeness and determinism: hosts never span shards, per-host
    FIFO order and seq assignment are per-host, and outputs are keyed by
    the group's lead shard.

    ``ctx`` is the crawl-constant context (spec, policy, corpus_path,
    seen_handles, shard counts, run_dir, flags) put to the object store
    ONCE per crawl and shared by every task of every round. ``cookies`` is
    the round-start cookie snapshot (Crawl.hs:106). ``snap_refs`` is one
    ray.put ObjectRef wrapping the list of per-seen-shard round-start
    guard-snapshot refs (sorted url-hash arrays; see ``is_done`` below),
    resolved only if the task's meta-refresh guards actually query it.

    ``frontier_packs``, when given, carry THIS task's frontier rows: one
    pack ObjectRef per frontier group the task's shards map to, each pack
    holding the group's table refs from every previous-round
    combined_round actor call, zero-copy through the object store. Tasks
    in the same frontier group share the identical pack object, so the
    driver serializes each group's 32 table refs once per round (one
    ray.put) instead of once per task (~1 ms/task of driver-serial
    submission). When absent (round 0 after seeding, or the first round
    of a resume), the shard's rows are read from the frontier_dir
    lineage files instead.

    Returns a (1 + n_docs_groups + n_seen_shards)-tuple for Ray
    multi-return: a stats dict {shard, n_proc, n_docs, shared_cookies,
    timings}; one stored-docs METADATA table per docs group, partitioned
    by the landed page's corpus shard (consumed by write_docs_group,
    which takes payloads locally and re-renders content bodies); then one
    META_SCHEMA table per seen shard (combined actor m receives exactly
    the (1+n_docs_groups+m)-th return of every fetch task). Per-consumer
    granularity matters: a consumer deserializes only its own slice,
    never the whole exchange. The exchanges travel through the OBJECT
    STORE — intra-round intermediate state, not checkpoint lineage
    (resume reruns the round from the frontier files); as files they cost
    more than the crawl's real work.
    """
    _t_task = time.time()
    shards = (
        [shards_of_task] if isinstance(shards_of_task, int) else list(shards_of_task)
    )
    shard = shards[0]  # group lead: names this task's partition files
    spec = ctx["spec"]
    policy = ctx["policy"]
    seen_handles = ctx["seen_handles"]
    n_seen_shards = ctx["n_seen_shards"]
    run_dir = ctx["run_dir"]
    politeness_delay = ctx["politeness_delay"]
    rdir = os.path.join(run_dir, f"round_{round_idx:05d}")
    order_dir = os.path.join(rdir, "order")
    logs_dir = os.path.join(rdir, "logs")
    metrics_dir = os.path.join(rdir, "metrics")
    for d in (order_dir, logs_dir):
        os.makedirs(d, exist_ok=True)

    n_docs_groups = ctx["n_docs_groups"]
    corpus_shard_of_host = ctx["corpus_shard_of_host"]

    def _docs_group_of(pid: int) -> int:
        # co-partition with the corpus store: sharded corpus -> the landed
        # host's corpus shard; flat corpus -> page-id range (the flat file
        # is sorted by image_id, so a range is a contiguous group run)
        if corpus_shard_of_host is not None:
            return corpus_shard_of_host[spec.host_of(pid)] % n_docs_groups
        return pid * n_docs_groups // spec.n_pages

    def _docs_table(docs: list[dict]) -> pa.Table:
        # metadata only — the content body is re-rendered from (spec,
        # page_id) in write_docs_group, not shipped through the object
        # store (round-3 scaling change, see module doc)
        return pa.table(
            {
                "url": pa.array([d["url"] for d in docs], pa.string()),
                "redirect_chain": pa.array(
                    [d["redirect_chain"] for d in docs], pa.list_(pa.string())
                ),
                "worker_id": pa.array([d["worker_id"] for d in docs], pa.string()),
                "round": pa.array([d["round"] for d in docs], pa.int32()),
                "host": pa.array([d["host"] for d in docs], pa.string()),
                "seq": pa.array([d["seq"] for d in docs], pa.int64()),
                "hops": pa.array([d["hops"] for d in docs], pa.int32()),
                "page_id": pa.array([d["page_id"] for d in docs], pa.int64()),
            }
        )

    def _returns(stats: dict, docs: list[dict], meta_rows: list[tuple]):
        by_g: dict[int, list[dict]] = {}
        for d in docs:
            by_g.setdefault(_docs_group_of(d["page_id"]), []).append(d)
        docs_tables = [
            _docs_table(by_g.get(g, [])) for g in range(n_docs_groups)
        ]
        hs = [url_hash(row[1]) for row in meta_rows]
        by_ss: dict[int, list[int]] = {}
        for j, h in enumerate(hs):
            by_ss.setdefault(h % n_seen_shards, []).append(j)
        tables = []
        for m in range(n_seen_shards):
            idxs = by_ss.get(m)
            if not idxs:
                tables.append(META_SCHEMA.empty_table())
                continue
            rows = [meta_rows[j] for j in idxs]
            cols = list(zip(*rows)) + [[hs[j] for j in idxs]]
            tables.append(
                pa.table(
                    {
                        f.name: pa.array(list(c), f.type)
                        for f, c in zip(META_SCHEMA, cols)
                    }
                )
            )
        return (stats, *docs_tables, *tables)

    # meta-refresh trap-guard reads (checkNotDone, Crawl.hs:138): answered
    # from the round-start seen SNAPSHOT — per-shard sorted url-hash
    # arrays the seen actors published to the object store when the round
    # began (state/seen.py snapshot_hashes). The seen set is frozen for
    # the whole fetch phase (mutations only apply in the combined phase),
    # so the snapshot is exact; reading it is a zero-copy plasma get the
    # first time a task needs a shard, instead of a blocking actor
    # round-trip that serialized every fetch task against the seen actors
    # (measured ~12 core-s/large round, with multi-second whole-round
    # stalls whenever deferred docs/delta work kept an actor's mailbox
    # busy). ``snap_refs`` is ONE ray.put ref wrapping the per-shard
    # snapshot refs (driver serializes the list once per round, not once
    # per task); absent (None) falls back to blocking status_many calls.
    snap_cache: dict[int, np.ndarray] = {}
    guard_wait = [0.0, 0]  # accumulated blocking time, call count

    def is_done(url: str) -> bool:
        h = url_hash(url)
        m = h % n_seen_shards
        if snap_refs is not None:
            if not snap_cache:
                # first guard query: resolve ALL shard snapshots in one
                # plasma get (they were published at round start and are
                # long since ready — one batched get beats 32 sequential
                # ~0.8 ms gets, measured ~6 core-s/large round)
                _t0 = time.time()
                # snap_refs arrives as the unwrapped list (Ray resolves
                # the top-level pack ref at dispatch); the inner refs
                # resolve here, in one batched plasma get
                snap_cache.update(enumerate(ray.get(list(snap_refs))))
                guard_wait[0] += time.time() - _t0
                guard_wait[1] += 1
            arr = snap_cache[m]
            j = int(np.searchsorted(arr, np.uint64(h)))
            return j < len(arr) and int(arr[j]) == h
        _t0 = time.time()
        [code] = ray.get(
            seen_handles[m].status_many.remote(
                [url], np.array([h], dtype=np.uint64)
            )
        )
        guard_wait[0] += time.time() - _t0
        guard_wait[1] += 1
        return code != 0

    if frontier_packs:
        # unwrap: pack refs -> per-group lists of table refs -> tables
        # (all plasma-local gets; every ref was ready before this round's
        # tasks were submitted — the driver waits on combined stats)
        part_refs = [r for pack in ray.get(list(frontier_packs)) for r in pack]
        frontier_parts = ray.get(part_refs)
        # group tables carry a shard column: filter to THIS task's shards
        shard_set = pa.array(shards, pa.int32())
        mine = []
        for t in frontier_parts:
            if t.num_rows == 0:
                continue
            t = t.filter(
                pa.compute.is_in(t["shard"], value_set=shard_set)
            ).drop_columns(["shard"])
            if t.num_rows:
                mine.append(t)
        group = pa.concat_tables(mine) if mine else None
    else:
        group = read_frontier_group(frontier_dir, shards)
    if group is None:
        return _returns(
            {
                "shard": shard, "n_proc": 0, "n_docs": 0,
                "shared_cookies": [], "sec": time.time() - _t_task,
                "t_read": 0.0, "t_proc": 0.0, "t_docs": 0.0, "t_meta": 0.0,
                "t_guard": 0.0, "n_guard": 0, "t0": _t_task, "t1": time.time(),
            },
            [],
            [],
        )
    _t_read = time.time() - _t_task

    # per-host FIFO: order by (host, candidate key); assign per-host seq
    host_col = group["host"].to_pylist()
    url_col = group["url"].to_pylist()
    _ph = group["p_host"].to_pylist()
    _ps = group["p_seq"].to_pylist()
    _li = group["link_idx"].to_pylist()
    order = sorted(
        range(group.num_rows),
        key=lambda i: (host_col[i], _ph[i], _ps[i], _li[i]),
    )

    _cpu0 = time.process_time()

    meta_rows: list[tuple] = []  # rows of META_SCHEMA
    docs: list[dict] = []
    order_rows: list[tuple] = []
    log_rows: list[tuple] = []
    shared_cookies: list[tuple] = []  # (host, seq, name, value)
    timings: list[tuple] = []
    last_fetch_at: dict[str, float] = {}
    seq_counter: dict[str, int] = {}

    for i in order:
        host, url = host_col[i], url_col[i]
        seq = seq_counter.get(host, 0)
        seq_counter[host] = seq + 1
        if politeness_delay > 0:
            since = time.time() - last_fetch_at.get(host, 0.0)
            if since < politeness_delay:
                time.sleep(politeness_delay - since)
        t0 = time.time()
        out = process_url(spec, policy, url, is_done, cookies=cookies)
        t1 = time.time()
        last_fetch_at[host] = t1
        if ctx["record_metrics"]:
            timings.append((host, url, t0, t1))

        order_rows.append((url, host, seq, f"{out.status}:{out.reason}"))
        if out.status == "stored":
            # canonical mutation stream (oracle.py lines 99-106): pop the
            # frontier URL unconditionally, then complete the chain
            meta_rows.append(("mut", url, "", host, seq, 0, 0))
            for j, u in enumerate(out.completed):
                meta_rows.append(("mut", u, "", host, seq, j + 1, 2))
            for n, v in out.shared_cookies:
                shared_cookies.append((host, seq, n, v))
            for idx, link in enumerate(out.links):
                if not policy.include.accepts(link):
                    continue  # processNextUrl include gate (Crawl.hs:189)
                meta_rows.append(
                    ("link", link, get_domain(link) or "", host, seq, idx, 0)
                )
            for k, u, d in out.logs:
                log_rows.append((u, f"{k}: {d}"))
            docs.append(
                {
                    "url": url,
                    "redirect_chain": list(out.redirect_chain),
                    "worker_id": f"shard-{shard}",
                    "round": round_idx,
                    "host": host,
                    "seq": seq,
                    "hops": out.hops,
                    "page_id": out.page_id,
                }
            )
        elif out.status == "failed":
            meta_rows.append(("mut", url, "", host, seq, 0, 3))
            log_rows.append((url, f"error: {out.reason}"))
        # 'excluded' / 'meta_trap': stays in_progress; nothing emitted

    _t_proc = time.time() - _t_task - _t_read
    _t_cpu = time.process_time() - _cpu0
    _atomic_write(
        os.path.join(order_dir, f"part-{shard:05d}.parquet"),
        pa.table(
            {
                "url": pa.array([r[0] for r in order_rows], pa.string()),
                "host": pa.array([r[1] for r in order_rows], pa.string()),
                "seq": pa.array([r[2] for r in order_rows], pa.int64()),
                "detail": pa.array([r[3] for r in order_rows], pa.string()),
            }
        ),
    )
    if log_rows:
        _atomic_write(
            os.path.join(logs_dir, f"part-{shard:05d}.parquet"),
            pa.table(
                {
                    "url": pa.array([r[0] for r in log_rows], pa.string()),
                    "detail": pa.array([r[1] for r in log_rows], pa.string()),
                }
            ),
        )
    if ctx["record_metrics"] and timings:
        os.makedirs(metrics_dir, exist_ok=True)
        _atomic_write(
            os.path.join(metrics_dir, f"part-{shard:05d}.parquet"),
            pa.table(
                {
                    "host": pa.array([x[0] for x in timings], pa.string()),
                    "url": pa.array([x[1] for x in timings], pa.string()),
                    "t_start": pa.array([x[2] for x in timings], pa.float64()),
                    "t_end": pa.array([x[3] for x in timings], pa.float64()),
                    "shard": pa.array([shard] * len(timings), pa.int32()),
                }
            ),
        )

    # t_docs = the order/logs/metrics LINEAGE parquet writes above (the
    # docs payload itself is written by the overlapped write_docs_group
    # task and reported as docs_phases); t_meta = building the docs +
    # per-seen-shard meta Arrow returns in _returns. Previously t_meta
    # was hardcoded 0 and the _returns construction was attributed to no
    # phase (review r5) — anyone reading fetch_phases optimized the
    # wrong stage.
    _t_docs = time.time() - _t_task - _t_read - _t_proc
    stats = {
        "shard": shard,
        "n_proc": len(order_rows),
        "n_docs": len(docs),
        "shared_cookies": shared_cookies,
        "sec": 0.0,  # patched below, after the return tables are built
        "t_read": _t_read,
        "t_proc": _t_proc,
        "t_docs": _t_docs,
        "t_meta": 0.0,  # patched below
        "t_guard": guard_wait[0],
        "n_guard": guard_wait[1],
        "t_cpu": _t_cpu,
        "t0": _t_task,
        "t1": 0.0,  # patched below
        # which physical node ran this shard (multi-node evidence)
        "node": ray.get_runtime_context().get_node_id()[:8],
    }
    ret = _returns(stats, docs, meta_rows)
    # stats rides inside ret by reference: patch the construction phase in
    now = time.time()
    stats["t_meta"] = now - _t_task - _t_read - _t_proc - _t_docs
    stats["sec"] = now - _t_task
    stats["t1"] = now
    return ret


def write_docs_group(
    group: int,
    ctx: dict,
    round_idx: int,
    *docs_tbls: pa.Table,
) -> dict:
    """Re-render content bodies from (spec, page_id), attach image payload
    columns (one bulk corpus take — the J4 index lookup, SURVEY.md §2.5)
    and write this docs GROUP's partition file. ``docs_tbls`` are the
    group's metadata returns from every fetch task of the round. Runs as
    its own raw task per group, dependent only on the fetch returns — so
    payload persistence overlaps the combined phase and the next round's
    fetch instead of sitting on the round barrier.

    The group is a set of corpus shards (fetch tasks route each doc by
    its landed page's corpus shard), so the payload take below only ever
    touches partitions this group owns, with every row-group read
    amortized over all of the round's rows landing in it — the corpus is
    read ~once per round total instead of once per (fetch shard x
    foreign-landing row).

    The body re-render trades ~30 us CPU per doc for ~1 KB of object-store
    traffic per doc (the fetch stage already proved body == render_page(
    page_id) for every stored outcome — see fetchsim.simulate_fetch): at
    32 workers the shared plasma store was the measured scaling ceiling.

    With ``verify_payload`` the per-row invariant from BASELINE.json
    input_hint runs inline: decoded pixels vs ground truth (exact for
    lossless, PSNR >= 40 dB for lossy), caption equality, phash equality.
    """
    _t0 = time.time()
    nonempty = [t for t in docs_tbls if t.num_rows]
    if not nonempty:
        return {"n": 0, "t0": _t0, "t1": time.time()}
    docs_tbl = (
        nonempty[0] if len(nonempty) == 1 else pa.concat_tables(nonempty)
    )
    from ..codecs import decode_image, perceptual_hash

    spec = ctx["spec"]
    corpus = _corpus(ctx["corpus_path"])
    docs_dir = os.path.join(
        ctx["run_dir"], f"round_{round_idx:05d}", "docs"
    )
    os.makedirs(docs_dir, exist_ok=True)

    page_ids = docs_tbl["page_id"].to_pylist()
    if hasattr(corpus, "take_pages"):
        payload = corpus.take_pages(page_ids)
    else:
        payload = corpus.take([spec.image_id(p) for p in page_ids])
    _t_take = time.time()
    ok_col = None
    if ctx["verify_payload"]:
        # the per-row invariant, batched by (h, w, fmt): PSNR / equality /
        # phash run as one stacked numpy pass per shape group instead of
        # per image (tiny-array numpy call overhead measured ~250 us/doc
        # under 32-way load, >40% of the docs stage). Values are
        # bit-identical to the per-image formulation: integer sums are
        # exact in float64 and every corpus dim is a multiple of 8.
        datas = payload["bytes"].to_pylist()
        caps = payload["caption"].to_pylist()
        phs = payload["phash"].to_pylist()
        fmts = payload["fmt"].to_pylist()
        ws = payload["w"].to_pylist()
        hs = payload["h"].to_pylist()
        oks = np.zeros(len(page_ids), dtype=np.int8)
        by_shape: dict[tuple, list[int]] = {}
        for j, (h, w, fmt) in enumerate(zip(hs, ws, fmts)):
            by_shape.setdefault((h, w, fmt), []).append(j)
        for (h, w, fmt), idxs in by_shape.items():
            truths = np.stack([spec.pixels_of(page_ids[j]) for j in idxs])
            decs = np.stack([decode_image(datas[j]) for j in idxs])
            n = len(idxs)
            if fmt == "jpeg":
                d = truths.astype(np.int64) - decs
                mse = (d * d).sum(axis=(1, 2, 3)) / d[0].size
                with np.errstate(divide="ignore"):
                    pix_ok = np.where(
                        mse == 0, True,
                        10.0 * np.log10(255.0**2 / np.maximum(mse, 1e-300)) >= 40.0,
                    )
            else:
                pix_ok = (truths == decs).all(axis=(1, 2, 3))
            if h % 8 == 0 and w % 8 == 0:
                g = truths.mean(axis=3, dtype=np.float64)
                blocks = g.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
                bits = blocks > blocks.mean(axis=(1, 2), keepdims=True)
                packed = np.packbits(bits.reshape(n, 64), axis=1)
                ph_t = [
                    v - 2**64 if v >= 2**63 else v
                    for v in (int.from_bytes(row.tobytes(), "big") for row in packed)
                ]
            else:  # pragma: no cover - corpus dims are 8-divisible
                ph_t = [perceptual_hash(t) for t in truths]
            for k, j in enumerate(idxs):
                oks[j] = int(
                    bool(pix_ok[k])
                    and caps[j] == spec.caption_of(page_ids[j])
                    and ph_t[k] == phs[j]
                )
        ok_col = pa.array(oks, pa.int8())
    _t_verify = time.time()
    bodies = pa.array(
        [
            spec.render_page(p, spec.caption_of(p)).encode()
            for p in page_ids
        ],
        pa.binary(),
    )
    table = docs_tbl.drop_columns(["page_id"])
    # content at index 2: keeps the docs-file column order of rounds 1-2
    table = table.add_column(2, pa.field("content", pa.binary()), bodies)
    table = table.append_column("image_id", payload["image_id"])
    table = table.append_column("image_bytes", payload["bytes"])
    table = table.append_column("caption", payload["caption"])
    table = table.append_column("w", payload["w"])
    table = table.append_column("h", payload["h"])
    table = table.append_column("fmt", payload["fmt"])
    table = table.append_column("phash", payload["phash"])
    if ok_col is not None:
        table = table.append_column("payload_ok", ok_col)
    _t_render = time.time()
    _atomic_write(os.path.join(docs_dir, f"part-{group:05d}.parquet"), table)
    _t1 = time.time()
    return {
        "n": table.num_rows, "t0": _t0, "t1": _t1,
        "t_take": _t_take - _t0, "t_verify": _t_verify - _t_take,
        "t_render": _t_render - _t_verify, "t_write": _t1 - _t_render,
    }


def combined_round(
    state,
    n_fetch_shards: int,
    run_dir: str,
    round_idx: int,
    next_frontier_dir: str,
    metas,
) -> tuple:
    """Terminal + candidate phase for ONE seen shard -- runs INSIDE the
    shard's actor process (``state`` is its SeenShardLocal; mutations are
    direct method calls: no blocked task slots, no actor round trips).

    ``metas`` are this shard's META_SCHEMA tables, one per fetch task
    (the matching multi-return of each), delivered zero-copy through the
    object store. Per-URL mutation ordering per oracle.py's convention:
    ALL terminal mutations replay in canonical (host, seq, op_idx) order
    (ADVICE r1 -- releases interleave with completions exactly as the
    oracle pops), then candidate insertIfNotDone with within-round dedup
    by minimal discovery key.

    Returns (stats dict, *frontier partitions) -- one shard-column-tagged
    FRONTIER_SCHEMA table per frontier GROUP (n_frontier_groups, not one
    per fetch shard: at 256 shards the 257 multi-returns per call cost
    ~0.5 ms of object-store bookkeeping each, ~1 s of wall per drain
    round); fetch task s filters its group tables to its own shard rows.
    Survivors are ALSO written as ONE lineage frontier file
    (row-group-partitioned by fetch shard) -- read only on resume. The
    shard's seen-delta checkpoint file is written LAST so a committed
    round's delta reflects every mutation of the round.
    """
    if os.environ.get("GRAFT_PROF_COMBINED") and state.shard_id == 0:
        import cProfile
        import pstats

        pr = cProfile.Profile()
        pr.enable()
        try:
            return _combined_round_body(
                state, n_fetch_shards, run_dir, round_idx, next_frontier_dir,
                metas,
            )
        finally:
            pr.disable()
            st_ = pstats.Stats(pr)
            st_.sort_stats("cumulative")
            st_.dump_stats(f"/tmp/comb_prof_round_{round_idx}.pstats")
    return _combined_round_body(
        state, n_fetch_shards, run_dir, round_idx, next_frontier_dir, metas
    )


def _combined_round_body(
    state,
    n_fetch_shards: int,
    run_dir: str,
    round_idx: int,
    next_frontier_dir: str,
    metas,
) -> tuple:
    _t_task = time.time()
    ss = state.shard_id
    rdir = os.path.join(run_dir, f"round_{round_idx:05d}")
    delta_dir = os.path.join(rdir, "seen_delta")
    os.makedirs(next_frontier_dir, exist_ok=True)
    os.makedirs(delta_dir, exist_ok=True)

    nonempty = [m for m in metas if m.num_rows]
    n_new = 0
    frontier_parts = None
    prof = {"t_read": 0.0, "t_mut": 0.0, "t_cand": 0.0, "t_write": 0.0, "t_delta": 0.0}
    if nonempty:
        import pandas as pd

        t = pa.concat_tables(nonempty)
        prof["t_read"] = time.time() - _t_task
        is_mut = pa.compute.equal(t["kind"], "mut").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        # vectorized canonical (p_host, p_seq, link_idx) order: factorize
        # p_host with sort=True so integer codes preserve its lex order,
        # then one lexsort — only the PER-URL relative order is semantic
        # (mutations of distinct URLs commute), and this reproduces the
        # oracle's exactly
        ph_codes, _ = pd.factorize(
            t["p_host"].combine_chunks().to_numpy(zero_copy_only=False),
            sort=True,
        )
        ps_np = t["p_seq"].combine_chunks().to_numpy(zero_copy_only=False)
        li_np = t["link_idx"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((li_np, ps_np, ph_codes))

        mut_order = order[is_mut[order]]
        if len(mut_order):
            mut_t = t.take(pa.array(mut_order, pa.int64()))
            mu = mut_t["url"].to_pylist()
            mh = (
                mut_t["uhash"]
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
            )
            mo = mut_t["op"].to_pylist()
            # terminal mutations durable before candidate inserts
            state.apply_mutations(mu, mh, mo)
        prof["t_mut"] = time.time() - _t_task - prof["t_read"]

        cand_order = order[~is_mut[order]]
        if len(cand_order):
            # within-round dedup: first occurrence in canonical order wins
            cand_urls = t["url"].combine_chunks().to_numpy(zero_copy_only=False)
            dup = pd.Series(cand_urls[cand_order]).duplicated().to_numpy()
            keep_order = cand_order[~dup]
            uniq = [cand_urls[i] for i in keep_order]
            all_h = (
                t["uhash"].combine_chunks().to_numpy(zero_copy_only=False)
            )
            hashes = all_h[keep_order].astype(np.uint64)
            ok = np.asarray(state.check_and_insert(uniq, hashes), dtype=bool)
            keep = keep_order[ok]
            n_new = len(keep)
            prof["t_cand"] = (
                time.time() - _t_task - prof["t_read"] - prof["t_mut"]
            )
            if n_new:
                sub = t.take(pa.array(keep, pa.int64())).select(
                    ["url", "host", "p_host", "p_seq", "link_idx"]
                )
                write_frontier_shards(
                    sub, next_frontier_dir, n_fetch_shards, f"from_{ss:05d}"
                )
                frontier_parts = partition_frontier_groups(sub, n_fetch_shards)
            prof["t_write"] = time.time() - _t_task - sum(
                prof[k] for k in ("t_read", "t_mut", "t_cand")
            )
    if frontier_parts is None:
        empty = FRONTIER_SCHEMA.empty_table().append_column(
            "shard", pa.array([], pa.int32())
        )
        frontier_parts = [empty] * n_frontier_groups(n_fetch_shards)

    # per-shard checkpoint delta (was a separate driver round-trip in r1)
    state.write_delta(delta_dir)
    prof["t_delta"] = time.time() - _t_task - sum(
        prof[k] for k in ("t_read", "t_mut", "t_cand", "t_write")
    )
    stats = {"sshard": ss, "n_new": n_new, "sec": time.time() - _t_task,
             "t0": _t_task, "t1": time.time(), **prof}
    return (stats, *frontier_parts)
