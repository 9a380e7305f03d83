"""Fetch stage: host-sharded, politeness-preserving actor-pool map_groups.

Frontier rows are grouped by ``shard = url_hash(host) % n_fetch_shards``
(SURVEY.md §2.4 T1): every URL of a host lands in exactly ONE group, each
group is processed by ONE task/actor sequentially, so the reference's
structural politeness invariant — at most one in-flight request per host at
any time (/root/reference/src/PoliteQueue.hs:34-64, one thread owns a
domain) — holds under data parallelism. Within a group, rows are processed
in per-host FIFO discovery order; an optional ``politeness_delay`` enforces
a min interval between fetches to the same host (the reference has no
timer; concurrency cap 1 is its only budget).

The callable class is constructed once per pool actor: corpus handle (the
reference's shared HTTP Manager, Crawl.hs:42-44), compiled policy, seen-
shard handles (read-only during the fetch phase — meta-refresh trap guard,
Crawl.hs:138). Stored documents (HTML + image payload columns) are written
directly to this round's partitioned parquet from inside the task —
payload bytes never enter a shuffle (SURVEY.md §7 hard part d); only
metadata rows (links/completions/logs/order) flow back into the Dataset.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..fetchsim import FetchPolicy, process_url
from ..sources.corpus import open_corpus
from ..state.seen import STATUS_NAMES
from ..urlkit import url_hash
from ..webgen import WebSpec

# Unified metadata-row schema flowing out of the fetch stage. ``sshard``
# (seen-set shard of the row's url) is the grouping key of the downstream
# combined terminal+candidate phase; the groupby between the two stages is
# an all-to-all barrier, so every fetch task (and its read-only meta-guard
# lookups) completes before any seen-set mutation happens — the round's
# snapshot invariant.
META_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # completed | release | failed | link | stat
        ("url", pa.string()),
        ("host", pa.string()),
        ("seq", pa.int64()),
        ("p_host", pa.string()),
        ("p_seq", pa.int64()),
        ("link_idx", pa.int32()),
        ("detail", pa.string()),
        ("sshard", pa.int32()),
    ]
)

DOC_SCHEMA = pa.schema(
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


def frontier_shard_column(batch: pa.Table, n_fetch_shards: int) -> pa.Table:
    """Add the politeness partition key (host-hash shard)."""
    shards = pa.array(
        [url_hash(h) % n_fetch_shards for h in batch["host"].to_pylist()],
        pa.int32(),
    )
    return batch.append_column("shard", shards)


class FetchGroup:
    """Callable-class for ``groupby("shard").map_groups`` actor pools."""

    def __init__(
        self,
        spec: WebSpec,
        policy: FetchPolicy,
        corpus_path: str,
        seen_handles: list,
        n_seen_shards: int,
        run_dir: str,
        round_idx: int,
        politeness_delay: float = 0.0,
        record_metrics: bool = False,
    ):
        self.spec = spec
        self.policy = policy
        self.corpus = open_corpus(corpus_path)  # once per actor
        self.seen = seen_handles
        self.n_seen = n_seen_shards
        rdir = os.path.join(run_dir, f"round_{round_idx:05d}")
        self.docs_dir = os.path.join(rdir, "docs")
        self.metrics_dir = os.path.join(rdir, "metrics")
        self.order_dir = os.path.join(rdir, "order")
        self.logs_dir = os.path.join(rdir, "logs")
        for d in (self.docs_dir, self.order_dir, self.logs_dir):
            os.makedirs(d, exist_ok=True)
        self.round_idx = round_idx
        self.delay = politeness_delay
        self.record_metrics = record_metrics
        self._guard_cache: dict[str, bool] = {}

    def _is_done(self, url: str) -> bool:
        """Trap-guard lookup against round-start seen state (read-only
        during the fetch phase, so deterministic)."""
        hit = self._guard_cache.get(url)
        if hit is not None:
            return hit
        h = url_hash(url)
        [code] = ray.get(
            self.seen[h % self.n_seen].status_many.remote([url], _np_u64([h]))
        )
        done = code != 0
        self._guard_cache[url] = done
        return done

    def __call__(self, group: pa.Table) -> pa.Table:
        import numpy as np  # noqa: F401 (kept local for serialization)

        if group.num_rows == 0:
            return META_SCHEMA.empty_table()
        shard = int(group["shard"][0].as_py())
        # per-host FIFO: order by (host, candidate key) and assign seq
        order = sorted(
            range(group.num_rows),
            key=lambda i: (
                group["host"][i].as_py(),
                group["p_host"][i].as_py(),
                group["p_seq"][i].as_py(),
                group["link_idx"][i].as_py(),
            ),
        )
        host_col = group["host"].to_pylist()
        url_col = group["url"].to_pylist()

        meta_rows: list[tuple] = []  # rows of META_SCHEMA
        docs: list[dict] = []
        order_rows: list[tuple] = []  # (url, host, seq, detail) -> order/ file
        log_rows: list[tuple] = []  # (url, detail) -> logs/ file
        timings: list[tuple[str, str, float, float]] = []
        last_fetch_at: dict[str, float] = {}
        seq_counter: dict[str, int] = {}

        for i in order:
            host, url = host_col[i], url_col[i]
            seq = seq_counter.get(host, 0)
            seq_counter[host] = seq + 1
            if self.delay > 0:
                since = time.time() - last_fetch_at.get(host, 0.0)
                if since < self.delay:
                    time.sleep(self.delay - since)
            t0 = time.time()
            out = process_url(self.spec, self.policy, url, self._is_done)
            t1 = time.time()
            last_fetch_at[host] = t1
            if self.record_metrics:
                timings.append((host, url, t0, t1))

            order_rows.append((url, host, seq, f"{out.status}:{out.reason}"))
            if out.status == "stored":
                for u in out.completed:
                    meta_rows.append(("completed", u, "", 0, "", 0, 0, "", url_hash(u) % self.n_seen))
                if url not in out.completed:
                    # sub-fetch quirk: in-progress released, not completed
                    meta_rows.append(("release", url, "", 0, "", 0, 0, "", url_hash(url) % self.n_seen))
                for idx, link in enumerate(out.links):
                    if not self.policy.include.accepts(link):
                        continue  # processNextUrl include gate (Crawl.hs:189)
                    from ..urlkit import get_domain

                    meta_rows.append(
                        ("link", link, get_domain(link) or "", 0, host, seq, idx,
                         "", url_hash(link) % self.n_seen)
                    )
                for k, u, d in out.logs:
                    log_rows.append((u, f"{k}: {d}"))
                docs.append(
                    {
                        "url": url,
                        "redirect_chain": list(out.redirect_chain),
                        "content": out.body.encode(),
                        "worker_id": f"shard-{shard}",
                        "round": self.round_idx,
                        "host": host,
                        "seq": seq,
                        "hops": out.hops,
                        "page_id": out.page_id,
                    }
                )
            elif out.status == "failed":
                meta_rows.append(("failed", url, "", 0, "", 0, 0, out.reason, url_hash(url) % self.n_seen))
                log_rows.append((url, f"error: {out.reason}"))
            # 'excluded' / 'meta_trap': stays in_progress; nothing emitted

        # per-shard stat row: (p_seq=n_processed, seq=n_docs) — lets the
        # driver count without extra dataset passes
        meta_rows.append(("stat", "", "", len(docs), "", len(order_rows), 0, "", shard % self.n_seen))

        if docs:
            self._write_docs(shard, docs)
        self._write_simple(
            self.order_dir, shard,
            pa.table({
                "url": pa.array([r[0] for r in order_rows], pa.string()),
                "host": pa.array([r[1] for r in order_rows], pa.string()),
                "seq": pa.array([r[2] for r in order_rows], pa.int64()),
                "detail": pa.array([r[3] for r in order_rows], pa.string()),
            }),
        )
        if log_rows:
            self._write_simple(
                self.logs_dir, shard,
                pa.table({
                    "url": pa.array([r[0] for r in log_rows], pa.string()),
                    "detail": pa.array([r[1] for r in log_rows], pa.string()),
                }),
            )
        if self.record_metrics and timings:
            self._write_metrics(shard, timings)

        cols = list(zip(*meta_rows)) if meta_rows else [[] for _ in META_SCHEMA]
        return pa.table(
            {f.name: pa.array(list(c), f.type) for f, c in zip(META_SCHEMA, cols)}
        )

    def _write_docs(self, shard: int, docs: list[dict]) -> None:
        """Attach image payload columns (one bulk corpus take) and write this
        group's partition file atomically (resumable layout)."""
        ids = [self.spec.image_id(d["page_id"]) for d in docs]
        payload = self.corpus.take(ids)
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
        path = os.path.join(self.docs_dir, f"part-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    def _write_simple(self, dir_path: str, shard: int, table: pa.Table) -> None:
        path = os.path.join(dir_path, f"part-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)

    def _write_metrics(self, shard: int, timings: list[tuple]) -> None:
        os.makedirs(self.metrics_dir, exist_ok=True)
        t = pa.table(
            {
                "host": pa.array([x[0] for x in timings], pa.string()),
                "url": pa.array([x[1] for x in timings], pa.string()),
                "t_start": pa.array([x[2] for x in timings], pa.float64()),
                "t_end": pa.array([x[3] for x in timings], pa.float64()),
                "shard": pa.array([shard] * len(timings), pa.int32()),
            }
        )
        path = os.path.join(self.metrics_dir, f"part-{shard:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)


def _np_u64(vals):
    import numpy as np

    return np.array(vals, dtype=np.uint64)
