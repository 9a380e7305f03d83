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

Data exchange is FILE-PARTITIONED rather than sort-shuffled: the fetch task
for shard ``s`` reads ``frontier_k/shard_{s}-*.parquet`` (written by the
previous round's combined stage), writes its stored docs / order / logs /
metrics partition files, and writes its metadata rows partitioned by
seen-set shard (``meta/ss_{m}-from_{s}.parquet``). Each exchange file is
also checkpoint lineage — the explicit-shuffle-through-storage pattern a
100 TB crawl needs anyway for resume, and it costs no Ray sort. Round-2
change: the per-round fan-outs are plain ``@ray.remote`` tasks (one per
shard) instead of Ray Data executions — the streaming-executor startup
(~seconds × 2 executions × rounds) was the dominant unscalable cost behind
the round-1 scaling-efficiency miss (VERDICT r1 #1); raw tasks cut the
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


def write_frontier_shards(
    table: pa.Table, frontier_dir: str, n_fetch_shards: int, origin: str
) -> None:
    """Partition frontier rows by host-hash fetch shard into files the next
    round's fetch tasks read directly (the explicit 'shuffle 1')."""
    os.makedirs(frontier_dir, exist_ok=True)
    hosts = table["host"].to_pylist()
    shard_of = [url_hash(h) % n_fetch_shards for h in hosts]
    by_shard: dict[int, list[int]] = {}
    for i, s in enumerate(shard_of):
        by_shard.setdefault(s, []).append(i)
    for s, idxs in by_shard.items():
        _atomic_write(
            os.path.join(frontier_dir, f"shard_{s:05d}-{origin}.parquet"),
            table.take(pa.array(idxs, pa.int64())),
        )


def fetch_shard(
    shard: int,
    ctx: dict,
    round_idx: int,
    frontier_dir: str,
    cookies: tuple,
) -> dict:
    """Process ONE fetch shard's frontier rows (raw Ray task body).

    ``ctx`` is the crawl-constant context (spec, policy, corpus_path,
    seen_handles, shard counts, run_dir, flags) put to the object store
    ONCE per crawl and shared by every task of every round. ``cookies`` is
    the round-start cookie snapshot (Crawl.hs:106). Returns
    {shard, n_proc, n_docs, shared_cookies: [(host, seq, name, value)]}.
    """
    spec = ctx["spec"]
    policy = ctx["policy"]
    seen_handles = ctx["seen_handles"]
    n_seen_shards = ctx["n_seen_shards"]
    run_dir = ctx["run_dir"]
    politeness_delay = ctx["politeness_delay"]
    rdir = os.path.join(run_dir, f"round_{round_idx:05d}")
    docs_dir = os.path.join(rdir, "docs")
    order_dir = os.path.join(rdir, "order")
    logs_dir = os.path.join(rdir, "logs")
    meta_dir = os.path.join(rdir, "meta")
    metrics_dir = os.path.join(rdir, "metrics")
    for d in (docs_dir, order_dir, logs_dir, meta_dir):
        os.makedirs(d, exist_ok=True)

    corpus = _corpus(ctx["corpus_path"])
    guard_cache: dict[str, bool] = {}

    def is_done(url: str) -> bool:
        hit = guard_cache.get(url)
        if hit is not None:
            return hit
        h = url_hash(url)
        [code] = ray.get(
            seen_handles[h % n_seen_shards].status_many.remote(
                [url], np.array([h], dtype=np.uint64)
            )
        )
        guard_cache[url] = done = code != 0
        return done

    files = sorted(glob.glob(os.path.join(frontier_dir, f"shard_{shard:05d}-*.parquet")))
    if not files:
        return {"shard": shard, "n_proc": 0, "n_docs": 0, "shared_cookies": []}
    group = pa.concat_tables([pq.read_table(f) for f in files])

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
                    "content": out.body.encode(),
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

    if docs:
        _write_docs(docs_dir, shard, docs, spec, corpus, ctx["verify_payload"])
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

    # meta rows partitioned by seen shard -> files for the combined stage
    by_ss: dict[int, list[int]] = {}
    for j, row in enumerate(meta_rows):
        by_ss.setdefault(url_hash(row[1]) % n_seen_shards, []).append(j)
    for m, idxs in by_ss.items():
        rows = [meta_rows[j] for j in idxs]
        cols = list(zip(*rows))
        _atomic_write(
            os.path.join(meta_dir, f"ss_{m:05d}-from_{shard:05d}.parquet"),
            pa.table(
                {f.name: pa.array(list(c), f.type) for f, c in zip(META_SCHEMA, cols)}
            ),
        )

    return {
        "shard": shard,
        "n_proc": len(order_rows),
        "n_docs": len(docs),
        "shared_cookies": shared_cookies,
    }


def _write_docs(
    docs_dir: str, shard: int, docs: list[dict], spec, corpus, verify_payload: bool
) -> None:
    """Attach image payload columns (one bulk corpus take — the J4 index
    lookup, SURVEY.md §2.5) and write this shard's partition file. With
    ``verify_payload`` the per-row invariant from BASELINE.json input_hint
    runs inline: decoded pixels vs ground truth (exact for lossless, PSNR
    >= 40 dB for lossy), caption equality, phash equality."""
    from ..codecs import decode_image, perceptual_hash, psnr

    ids = [spec.image_id(d["page_id"]) for d in docs]
    payload = corpus.take(ids)
    ok_col = None
    if verify_payload:
        oks = []
        for d, data, cap, ph, fmt in zip(
            docs,
            payload["bytes"].to_pylist(),
            payload["caption"].to_pylist(),
            payload["phash"].to_pylist(),
            payload["fmt"].to_pylist(),
        ):
            px = decode_image(data)
            truth = spec.pixels_of(d["page_id"])
            if fmt == "jpeg":
                pix_ok = psnr(truth, px) >= 40.0
            else:
                pix_ok = np.array_equal(truth, px)
            oks.append(
                int(
                    pix_ok
                    and cap == spec.caption_of(d["page_id"])
                    and perceptual_hash(truth) == ph
                )
            )
        ok_col = pa.array(oks, pa.int8())
    table = pa.table(
        {
            "url": pa.array([d["url"] for d in docs], pa.string()),
            "redirect_chain": pa.array(
                [d["redirect_chain"] for d in docs], pa.list_(pa.string())
            ),
            "content": pa.array([d["content"] for d in docs], pa.binary()),
            "worker_id": pa.array([d["worker_id"] for d in docs], pa.string()),
            "round": pa.array([d["round"] for d in docs], pa.int32()),
            "host": pa.array([d["host"] for d in docs], pa.string()),
            "seq": pa.array([d["seq"] for d in docs], pa.int64()),
            "hops": pa.array([d["hops"] for d in docs], pa.int32()),
            "image_id": payload["image_id"],
            "image_bytes": payload["bytes"],
            "caption": payload["caption"],
            "w": payload["w"],
            "h": payload["h"],
            "fmt": payload["fmt"],
            "phash": payload["phash"],
        }
    )
    if ok_col is not None:
        table = table.append_column("payload_ok", ok_col)
    _atomic_write(os.path.join(docs_dir, f"part-{shard:05d}.parquet"), table)


def combined_shard(
    ss: int,
    ctx: dict,
    round_idx: int,
    next_frontier_dir: str,
) -> dict:
    """Terminal + candidate phase for ONE seen shard (raw Ray task body).

    Per-URL mutation ordering per oracle.py's convention: ALL terminal
    mutations replay in canonical (host, seq, op_idx) order (ADVICE r1 —
    releases interleave with completions exactly as the oracle pops), then
    candidate insertIfNotDone with within-round dedup by minimal discovery
    key. Survivors are written as next-round frontier files partitioned by
    fetch shard; the shard's seen-delta checkpoint file is written LAST so
    a committed round's delta reflects every mutation of the round.
    """
    seen_handles = ctx["seen_handles"]
    n_fetch_shards = ctx["n_fetch_shards"]
    run_dir = ctx["run_dir"]
    rdir = os.path.join(run_dir, f"round_{round_idx:05d}")
    meta_dir = os.path.join(rdir, "meta")
    delta_dir = os.path.join(rdir, "seen_delta")
    os.makedirs(next_frontier_dir, exist_ok=True)
    os.makedirs(delta_dir, exist_ok=True)
    handle = seen_handles[ss]

    files = sorted(glob.glob(os.path.join(meta_dir, f"ss_{ss:05d}-from_*.parquet")))
    n_new = 0
    if files:
        t = pa.concat_tables([pq.read_table(f) for f in files])
        kinds = t["kind"].to_pylist()
        urls = t["url"].to_pylist()
        ph_col = t["p_host"].to_pylist()
        ps_col = t["p_seq"].to_pylist()
        li_col = t["link_idx"].to_pylist()
        op_col = t["op"].to_pylist()

        mut_idx = [i for i, k in enumerate(kinds) if k == "mut"]
        mut_idx.sort(key=lambda i: (ph_col[i], ps_col[i], li_col[i]))
        if mut_idx:
            mu = [urls[i] for i in mut_idx]
            mh = np.array([url_hash(u) for u in mu], dtype=np.uint64)
            mo = [op_col[i] for i in mut_idx]
            # terminal mutations durable before candidate inserts
            ray.get(handle.apply_mutations.remote(mu, mh, mo))

        cand_idx = [i for i, k in enumerate(kinds) if k == "link"]
        if cand_idx:
            keys = {i: (ph_col[i], ps_col[i], li_col[i]) for i in cand_idx}
            best: dict[str, int] = {}
            for i in cand_idx:
                u = urls[i]
                j = best.get(u)
                if j is None or keys[i] < keys[j]:
                    best[u] = i
            idxs = sorted(best.values(), key=lambda i: keys[i])
            uniq = [urls[i] for i in idxs]
            hashes = np.array([url_hash(u) for u in uniq], dtype=np.uint64)
            ok = ray.get(handle.check_and_insert.remote(uniq, hashes))
            keep = [i for i, o in zip(idxs, ok) if o]
            n_new = len(keep)
            if keep:
                sub = t.take(pa.array(keep, pa.int64())).select(
                    ["url", "host", "p_host", "p_seq", "link_idx"]
                )
                write_frontier_shards(
                    sub, next_frontier_dir, n_fetch_shards, f"from_{ss:05d}"
                )

    # per-shard checkpoint delta (was a separate driver round-trip in r1)
    ray.get(handle.write_delta.remote(delta_dir))
    return {"sshard": ss, "n_new": n_new}
