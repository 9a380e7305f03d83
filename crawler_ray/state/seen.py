"""Sharded URL-seen state: cuckoo/bloom-fronted exact sets in Ray actors.

The reference keeps three STM containers (in-progress / completed / failed,
/root/reference/src/Types.hs:34-36) mutated atomically by every worker
(Crawl.hs:194-212). Distributed equivalent (SURVEY.md §2.4 T2): a pool of
``SeenShard`` actors, shard = ``url_hash % num_shards``. Each shard fronts
an exact dict with a cuckoo filter (bloom fallback once the cuckoo degrades)
so the common negative — "never seen this URL" — is answered from the filter
without touching the dict.

Round protocol (matches the oracle's mutation convention, oracle.py):
- during a round's fetch phase the shards are READ-ONLY: the meta-refresh
  trap guard reads the per-shard ``snapshot_hashes`` arrays published to
  the object store at round start (``status_many`` remains the exact
  string-keyed fallback / test surface);
- at round end the driver first applies completions/failures
  (``apply_terminal``), then candidate inserts (``check_and_insert``).

Checkpointing: ``snapshot_delta`` returns rows added/changed since the last
snapshot (per-round delta parquet, merged on resume via groupby-first).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .filters import BloomFilter, CuckooFilter

IN_PROGRESS = 1
COMPLETED = 2
FAILED = 3

STATUS_NAMES = {IN_PROGRESS: "in_progress", COMPLETED: "completed", FAILED: "failed"}
STATUS_CODES = {v: k for k, v in STATUS_NAMES.items()}


class SeenShardLocal:
    """The shard logic, actor-free (unit-testable; the oracle equivalence
    test runs it in-process)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 17):
        self.shard_id = shard_id
        self.status: dict[str, int] = {}
        self.cuckoo = CuckooFilter(capacity)
        self.bloom = BloomFilter(max(1024, capacity), 0.01)
        self._delta: list[tuple[str, int]] = []
        # url-hash mirror of ``status``'s key set, serving the per-round
        # read-only guard snapshot (``snapshot_hashes``): fetch tasks
        # answer the meta-refresh trap guard from a plasma-shared sorted
        # array instead of a blocking actor round-trip. Hash-keyed like
        # the fronting filters; a 64-bit blake2b collision (odds ~n^2/2^64
        # per shard) could flip one guard answer — the exact dict remains
        # the authority for every mutation path.
        self._hset: set[int] = set()

    # -- internal -------------------------------------------------------
    def _maybe_in(self, hashes: np.ndarray) -> np.ndarray:
        hit = self.cuckoo.contains_many(hashes)
        if self.cuckoo.degraded:
            hit |= self.bloom.contains_many(hashes)
        return hit

    def _remember(self, url: str, h: int, code: int) -> None:
        prev = self.status.get(url)
        self.status[url] = code
        self._delta.append((url, code))
        self._hset.add(int(h))
        if prev is None:
            arr = np.array([h], dtype=np.uint64)
            self.cuckoo.add_many(arr)
            self.bloom.add_many(arr)

    # -- round API ------------------------------------------------------
    def status_many(self, urls: list[str], hashes: np.ndarray) -> list[int]:
        """0 = never seen; else status code. Filter answers negatives."""
        maybe = self._maybe_in(hashes.astype(np.uint64))
        return [
            (self.status.get(u, 0) if m else 0) for u, m in zip(urls, maybe)
        ]

    def apply_mutations(self, urls: list[str], hashes: np.ndarray, ops: list[int]) -> None:
        """Replay per-outcome terminal mutations in the canonical
        (host, seq, op_idx) order the caller sorted them into (oracle.py's
        convention; ADVICE r1). op 0 = UNCONDITIONAL delete (S.delete
        in-progress, Crawl.hs:173 — the oracle pops whatever status the URL
        has); op COMPLETED/FAILED = set that status. Filter membership is
        order-insensitive, so new keys batch into ONE add_many at the end
        (a 1-element add_many per URL measured ~100us/row of actor time)."""
        new_hashes = []
        for u, h, op in zip(urls, hashes, ops):
            if op == 0:
                if u in self.status:
                    del self.status[u]
                    self._delta.append((u, 0))
                    self._hset.discard(int(h))
                # filters may keep a stale 'maybe'; the exact dict decides
            else:
                if self.status.get(u) is None:
                    new_hashes.append(h)
                self.status[u] = int(op)
                self._delta.append((u, int(op)))
                self._hset.add(int(h))
        if new_hashes:
            arr = np.asarray(new_hashes, dtype=np.uint64)
            self.cuckoo.add_many(arr)
            self.bloom.add_many(arr)

    def apply_terminal(self, urls: list[str], hashes: np.ndarray, codes: list[int]) -> None:
        """Completions/failures; completion overwrites in_progress
        (S.insert into completed, Crawl.hs:174). The original frontier URL's
        in-progress removal (Crawl.hs:173) is represented by the overwrite
        when it is in the chain, or an explicit 'failed'/'completed' code."""
        for u, h, c in zip(urls, hashes, codes):
            self._remember(u, int(h), c)

    def remove_in_progress(self, urls: list[str]) -> None:
        """S.delete from in-progress (Crawl.hs:173) for frontier URLs whose
        final chain did NOT include them (sub-fetch quirk): the URL becomes
        unseen again and may be re-enqueued later."""
        from ..urlkit import url_hash

        for u in urls:
            if self.status.get(u) == IN_PROGRESS:
                del self.status[u]
                self._delta.append((u, 0))
                self._hset.discard(url_hash(u))
                # filters may yield a false 'maybe'; the exact dict decides.

    def check_and_insert(self, urls: list[str], hashes: np.ndarray) -> list[bool]:
        """insertIfNotDone (Crawl.hs:194-201): True = newly inserted as
        in_progress (enqueue to frontier); False = already done. Filter
        inserts batched (see apply_mutations)."""
        out = []
        new_hashes = []
        maybe = self._maybe_in(hashes.astype(np.uint64))
        for u, h, m in zip(urls, hashes, maybe):
            if m and u in self.status:
                out.append(False)
            else:
                if self.status.get(u) is None:
                    new_hashes.append(h)
                self.status[u] = IN_PROGRESS
                self._delta.append((u, IN_PROGRESS))
                self._hset.add(int(h))
                out.append(True)
        if new_hashes:
            arr = np.asarray(new_hashes, dtype=np.uint64)
            self.cuckoo.add_many(arr)
            self.bloom.add_many(arr)
        return out

    # -- round-end combined phase (runs in-actor; see stages/fetch.py) --
    def combined_round(
        self,
        n_fetch_shards: int,
        run_dir: str,
        round_idx: int,
        next_frontier_dir: str,
        *metas,
    ):
        """Terminal mutations + candidate inserts + frontier partition +
        delta checkpoint for this shard, executed inside the actor so the
        round-end phase holds no task slots while touching shard state
        (stages.fetch.combined_round has the full convention doc)."""
        from ..stages.fetch import combined_round as _logic

        return _logic(
            self, n_fetch_shards, run_dir, round_idx, next_frontier_dir,
            metas,
        )

    # -- checkpoint -----------------------------------------------------
    def snapshot_delta(self) -> pa.Table:
        rows = self._delta
        self._delta = []
        return pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "status": pa.array([c for _, c in rows], pa.int8()),
                "shard": pa.array([self.shard_id] * len(rows), pa.int32()),
            }
        )

    def write_delta(self, dir_path: str) -> int:
        """Write this shard's since-last-snapshot delta parquet (checkpoint);
        the actor writes its own file so deltas never transit the driver."""
        import os

        import pyarrow.parquet as pq

        t = self.snapshot_delta()
        path = os.path.join(dir_path, f"shard-{self.shard_id:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return t.num_rows

    def restore(self, table: pa.Table) -> None:
        from ..urlkit import url_hash

        for u, c in zip(table["url"].to_pylist(), table["status"].to_pylist()):
            if c == 0:
                if self.status.pop(u, None) is not None:
                    self._hset.discard(url_hash(u))
            else:
                self._remember(u, url_hash(u), int(c))
        self._delta = []

    def snapshot_hashes(self) -> np.ndarray:
        """Sorted url-hash array of every currently-known URL — the
        round-start read-only guard snapshot. Published to the object
        store once per round; fetch tasks answer ``is_done`` with a
        binary search on the plasma-shared array instead of a blocking
        ``status_many`` actor call (which serialized every fetch task
        against this actor's mailbox at round start; measured ~12 core-s
        per large round, with multi-second tail stalls when a round's
        deferred docs/delta work kept the actor busy)."""
        return np.sort(np.fromiter(self._hset, dtype=np.uint64, count=len(self._hset)))

    def counts(self) -> dict[str, int]:
        vals = list(self.status.values())
        return {
            "total": len(vals),
            **{name: vals.count(code) for code, name in STATUS_NAMES.items()},
            "cuckoo_degraded": int(self.cuckoo.degraded),
        }

    def full_table(self) -> pa.Table:
        return pa.table(
            {
                "url": pa.array(list(self.status.keys()), pa.string()),
                "status": pa.array(list(self.status.values()), pa.int8()),
            }
        )


# One Ray actor per shard; num_cpus=0 so shards don't reserve scheduling
# slots away from the fetch pool (they do tiny bursts of work).
SeenShard = ray.remote(num_cpus=0)(SeenShardLocal)


def make_shards(num_shards: int, capacity_per_shard: int = 1 << 17):
    return [
        SeenShard.remote(i, capacity_per_shard) for i in range(num_shards)
    ]
