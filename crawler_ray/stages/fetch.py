"""Fetch stage: host-sharded, politeness-preserving, file-partitioned.

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
100 TB crawl needs anyway for resume, and it costs no Ray sort (measured
~4s/round of sort+actor-pool overhead saved at sandbox scale). The Ray
execution only carries shard IDs; the per-round barrier between fetch and
combined stages is the driver's ``take_all``.

Per-worker-process state (the reference's shared HTTP ``Manager``,
Crawl.hs:42-44) lives in a module-level cache: the corpus handle is opened
once per Ray worker process and reused across tasks and rounds — cheaper
than per-round actor pools, same amortization.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..fetchsim import FetchPolicy, process_url
from ..sources.corpus import open_corpus
from ..urlkit import get_domain, url_hash
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

# metadata rows exchanged fetch -> combined stage (per seen-shard files)
META_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # completed | release | failed | link
        ("url", pa.string()),
        ("host", pa.string()),
        ("p_host", pa.string()),
        ("p_seq", pa.int64()),
        ("link_idx", pa.int32()),
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


def fetch_shard_batch(
    batch: pa.Table,
    *,
    spec: WebSpec,
    policy: FetchPolicy,
    corpus_path: str,
    seen_handles: list,
    n_seen_shards: int,
    run_dir: str,
    round_idx: int,
    frontier_dir: str,
    politeness_delay: float = 0.0,
    record_metrics: bool = False,
    verify_payload: bool = False,
) -> pa.Table:
    """Process the fetch shards named in ``batch`` (typically one row).
    Returns one stats row per shard: (shard, n_proc, n_docs)."""
    rdir = os.path.join(run_dir, f"round_{round_idx:05d}")
    docs_dir = os.path.join(rdir, "docs")
    order_dir = os.path.join(rdir, "order")
    logs_dir = os.path.join(rdir, "logs")
    meta_dir = os.path.join(rdir, "meta")
    metrics_dir = os.path.join(rdir, "metrics")
    for d in (docs_dir, order_dir, logs_dir, meta_dir):
        os.makedirs(d, exist_ok=True)

    corpus = _corpus(corpus_path)
    guard_cache: dict[str, bool] = {}

    def is_done(url: str) -> bool:
        hit = guard_cache.get(url)
        if hit is not None:
            return hit
        h = url_hash(url)
        import numpy as np

        [code] = ray.get(
            seen_handles[h % n_seen_shards].status_many.remote(
                [url], np.array([h], dtype=np.uint64)
            )
        )
        guard_cache[url] = done = code != 0
        return done

    stats = []
    for shard in batch["item"].to_pylist():
        shard = int(shard)
        files = sorted(glob.glob(os.path.join(frontier_dir, f"shard_{shard:05d}-*.parquet")))
        if not files:
            stats.append((shard, 0, 0))
            continue
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
            out = process_url(spec, policy, url, is_done)
            t1 = time.time()
            last_fetch_at[host] = t1
            if record_metrics:
                timings.append((host, url, t0, t1))

            order_rows.append((url, host, seq, f"{out.status}:{out.reason}"))
            if out.status == "stored":
                for u in out.completed:
                    meta_rows.append(("completed", u, "", "", 0, 0))
                if url not in out.completed:
                    # sub-fetch quirk: in-progress released, not completed
                    # (Crawl.hs:169-174 closes over the innermost chain)
                    meta_rows.append(("release", url, "", "", 0, 0))
                for idx, link in enumerate(out.links):
                    if not policy.include.accepts(link):
                        continue  # processNextUrl include gate (Crawl.hs:189)
                    meta_rows.append(
                        ("link", link, get_domain(link) or "", host, seq, idx)
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
                meta_rows.append(("failed", url, "", "", 0, 0))
                log_rows.append((url, f"error: {out.reason}"))
            # 'excluded' / 'meta_trap': stays in_progress; nothing emitted

        if docs:
            _write_docs(docs_dir, shard, docs, spec, corpus, verify_payload)
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
        if record_metrics and timings:
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

        stats.append((shard, len(order_rows), len(docs)))

    return pa.table(
        {
            "shard": pa.array([s for s, _, _ in stats], pa.int32()),
            "n_proc": pa.array([p for _, p, _ in stats], pa.int64()),
            "n_docs": pa.array([d for _, _, d in stats], pa.int64()),
        }
    )


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
        import numpy as np

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


def combined_shard_batch(
    batch: pa.Table,
    *,
    seen_handles: list,
    n_seen_shards: int,
    n_fetch_shards: int,
    run_dir: str,
    round_idx: int,
    next_frontier_dir: str,
) -> pa.Table:
    """Terminal + candidate phase for the seen shards named in ``batch``
    (per-URL mutation ordering per oracle.py's convention: completions /
    failures / releases first, then candidate insertIfNotDone with
    within-round dedup by minimal discovery key). Survivors are written as
    next-round frontier files partitioned by fetch shard."""
    import numpy as np

    from ..state.seen import COMPLETED, FAILED

    meta_dir = os.path.join(run_dir, f"round_{round_idx:05d}", "meta")
    os.makedirs(next_frontier_dir, exist_ok=True)
    out_stats = []
    for ss in batch["item"].to_pylist():
        ss = int(ss)
        files = sorted(glob.glob(os.path.join(meta_dir, f"ss_{ss:05d}-from_*.parquet")))
        if not files:
            out_stats.append((ss, 0))
            continue
        t = pa.concat_tables([pq.read_table(f) for f in files])
        kinds = t["kind"].to_pylist()
        urls = t["url"].to_pylist()
        ph_col = t["p_host"].to_pylist()
        ps_col = t["p_seq"].to_pylist()
        li_col = t["link_idx"].to_pylist()
        handle = seen_handles[ss]

        term_u, term_h, term_c, releases = [], [], [], []
        cand_idx = []
        for i, k in enumerate(kinds):
            if k == "link":
                cand_idx.append(i)
            elif k == "release":
                releases.append(urls[i])
            else:
                term_u.append(urls[i])
                term_h.append(url_hash(urls[i]))
                term_c.append(COMPLETED if k == "completed" else FAILED)
        refs = []
        if term_u:
            refs.append(
                handle.apply_terminal.remote(
                    term_u, np.array(term_h, dtype=np.uint64), term_c
                )
            )
        if releases:
            refs.append(handle.remove_in_progress.remote(releases))
        if refs:
            ray.get(refs)  # terminal durable before candidate inserts

        n_new = 0
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
        out_stats.append((ss, n_new))

    return pa.table(
        {
            "sshard": pa.array([s for s, _ in out_stats], pa.int32()),
            "n_new": pa.array([n for _, n in out_stats], pa.int64()),
        }
    )
