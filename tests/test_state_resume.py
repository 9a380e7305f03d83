"""Unit tests: cuckoo/bloom filters, seen-shard logic, WARC entry layout,
and the kill-after-round-k resume path (byte-identical outputs)."""

import glob

import numpy as np
import pytest

from crawler_ray.state.filters import BloomFilter, CuckooFilter
from crawler_ray.state.seen import COMPLETED, IN_PROGRESS, SeenShardLocal
from crawler_ray.warc import warc_entry


def _keys(n, seed=0):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_bloom_no_false_negatives():
    bf = BloomFilter(10_000, 0.01)
    keys = _keys(10_000)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()


def test_bloom_false_positive_rate_reasonable():
    bf = BloomFilter(10_000, 0.01)
    bf.add_many(_keys(10_000, seed=1))
    fp = bf.contains_many(_keys(20_000, seed=2)).mean()
    assert fp < 0.05


def test_cuckoo_membership_and_delete():
    cf = CuckooFilter(10_000)
    keys = _keys(5_000, seed=3)
    cf.add_many(keys)
    assert not cf.degraded
    assert cf.contains_many(keys).all()  # no false negatives
    other = _keys(20_000, seed=4)
    assert cf.contains_many(other).mean() < 0.02  # 16-bit fp -> low fpr
    cf.delete_many(keys[:100])
    # deleted keys mostly gone (a collision can keep a fingerprint alive)
    assert cf.contains_many(keys[:100]).mean() < 0.1
    assert cf.contains_many(keys[100:]).all()


def test_cuckoo_batch_insert_conflicts_and_duplicates():
    """The vectorized add_many (round 4) resolves same-bucket conflicts
    within a batch first-wins with losers retrying the next slot; keys
    whose both buckets fill fall back to displacement. No false negatives
    under any of it: duplicate keys in one batch, many batches landing in
    the same buckets, incremental single adds interleaved with batches,
    and near-capacity load must all keep every added key a member."""
    import numpy as np

    cf = CuckooFilter(10_000)
    keys = _keys(6_000, seed=7)
    dup_batch = np.concatenate([keys[:500], keys[:500], keys[:500]])
    cf.add_many(dup_batch)  # duplicates in one batch
    for i in range(500, 1000):  # singleton batches (old sequential shape)
        cf.add_many(keys[i : i + 1])
    cf.add_many(keys[1000:])  # one big batch with conflicts
    assert not cf.degraded
    assert cf.contains_many(keys).all()
    # near-capacity: displacement fallback engages without losing keys
    cf2 = CuckooFilter(2_000)
    k2 = _keys(1_900, seed=8)
    cf2.add_many(k2)
    if not cf2.degraded:
        assert cf2.contains_many(k2).all()


def test_cuckoo_degrades_not_corrupts():
    cf = CuckooFilter(256)
    keys = _keys(2_000, seed=5)
    cf.add_many(keys)  # way over capacity -> must degrade, not crash
    assert cf.degraded


def test_seen_shard_round_protocol():
    from crawler_ray.urlkit import url_hash

    s = SeenShardLocal(0, capacity=1 << 12)
    urls = [f"http://h.test/{i}" for i in range(100)]
    hs = np.array([url_hash(u) for u in urls], dtype=np.uint64)
    ok = s.check_and_insert(urls, hs)
    assert all(ok)
    ok2 = s.check_and_insert(urls, hs)
    assert not any(ok2)  # all already in-progress
    assert s.status_many(urls[:5], hs[:5]) == [IN_PROGRESS] * 5
    s.apply_terminal(urls[:50], hs[:50], [COMPLETED] * 50)
    assert s.status_many(urls[:3], hs[:3]) == [COMPLETED] * 3
    # release makes a URL insertable again (sub-fetch quirk path)
    s.remove_in_progress(urls[60:61])
    assert s.status_many(urls[60:61], hs[60:61]) == [0]
    assert s.check_and_insert(urls[60:61], hs[60:61]) == [True]


def test_seen_shard_delta_restore_roundtrip():
    from crawler_ray.urlkit import url_hash

    a = SeenShardLocal(0)
    urls = [f"http://h.test/{i}" for i in range(50)]
    hs = np.array([url_hash(u) for u in urls], dtype=np.uint64)
    a.check_and_insert(urls, hs)
    a.apply_terminal(urls[:20], hs[:20], [COMPLETED] * 20)
    delta = a.snapshot_delta()
    b = SeenShardLocal(0)
    b.restore(delta.select(["url", "status"]))
    assert b.status == a.status


def test_snapshot_hashes_mirrors_status():
    """The guard snapshot (sorted url-hash array) must track the status
    dict through every mutation path: insert, terminal overwrite,
    delete-op, in-progress release, and delta restore."""
    from crawler_ray.urlkit import url_hash

    s = SeenShardLocal(0, capacity=1 << 12)
    urls = [f"http://h.test/{i}" for i in range(80)]
    hs = np.array([url_hash(u) for u in urls], dtype=np.uint64)

    def expect():
        want = np.sort(
            np.array([url_hash(u) for u in s.status], dtype=np.uint64)
        )
        got = s.snapshot_hashes()
        assert got.dtype == np.uint64
        assert np.array_equal(got, want)

    s.check_and_insert(urls, hs)
    expect()
    s.apply_terminal(urls[:30], hs[:30], [COMPLETED] * 30)
    expect()  # overwrites add no duplicate hashes
    s.apply_mutations(urls[30:40], hs[30:40], [0] * 10)  # deletes
    expect()
    s.remove_in_progress(urls[40:45])
    expect()
    b = SeenShardLocal(0)
    b.restore(s.snapshot_delta().select(["url", "status"]))
    assert np.array_equal(b.snapshot_hashes(), s.snapshot_hashes())


def test_warc_entry_layout():
    entry = warc_entry(["http://h.test/landed", "http://h.test/requested"], b"BODY")
    text = entry.decode()
    # WarcDocument.hs:17-45: version line, 3 length variants, record id =
    # LAST of chain, type response, uncompressed
    assert text.startswith("WARC/1.0\r\n")
    assert "Content-Length: 4\r\n" in text
    assert "Original-Content-Length: 4\r\n" in text
    assert "Uncompressed-Content-Length: 4\r\n" in text
    assert "WARC-Record-ID: http://h.test/requested\r\n" in text
    assert "WARC-Target-URI: http://h.test/requested\r\n" in text
    assert "WARC-Type: response\r\n" in text
    assert entry.endswith(b"BODY\r\n\r\n")


def test_resume_equals_straight_through(ray_session, tmp_path):
    """Kill after round 2, resume, compare everything byte-for-byte."""
    import pyarrow.parquet as pq

    from crawler_ray.fetchsim import FetchPolicy
    from crawler_ray.pipelines.checkpoint import committed_rounds, resume_crawl
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl, read_crawled, read_order
    from crawler_ray.urlkit import IncludePatterns
    from crawler_ray.webgen import ensure_web

    spec, corpus = ensure_web(250, 10, seed=7, cache_dir=str(tmp_path / "web"))
    policy = FetchPolicy(include=IncludePatterns(domain_patterns=frozenset([".test"])))
    seeds = [spec.url_of(i) for i in range(3)]

    base = dict(spec=spec, corpus_path=corpus, seeds=seeds, policy=policy,
                fetch_concurrency=2)
    cfg_a = CrawlConfig(run_dir=str(tmp_path / "a"), **base)
    crawl(cfg_a)

    cfg_b = CrawlConfig(run_dir=str(tmp_path / "b"), max_rounds=2, **base)
    crawl(cfg_b)
    assert committed_rounds(str(tmp_path / "b")) == [0, 1]
    cfg_b.max_rounds = 50
    resume_crawl(cfg_b)

    assert read_order(str(tmp_path / "a")).equals(read_order(str(tmp_path / "b")))
    da = read_crawled(str(tmp_path / "a")).to_pandas().sort_values(["round", "host", "seq"])
    db = read_crawled(str(tmp_path / "b")).to_pandas().sort_values(["round", "host", "seq"])
    assert list(da["url"]) == list(db["url"])
    assert [bytes(x) for x in da["content"]] == [bytes(x) for x in db["content"]]


def test_actor_death_recovers_byte_identical(ray_session, tmp_path):
    """Kill a live seen-shard actor mid-crawl (round 2); run_with_recovery
    must rebuild shards from the last committed round and finish with
    results byte-identical to an undisturbed run — a lost node costs a
    round retry, not the job."""
    import ray

    from crawler_ray.fetchsim import FetchPolicy
    from crawler_ray.pipelines.checkpoint import run_with_recovery
    from crawler_ray.pipelines.crawl import (
        CrawlConfig,
        crawl,
        read_crawled,
        read_order,
    )
    from crawler_ray.urlkit import IncludePatterns
    from crawler_ray.webgen import ensure_web

    spec, corpus = ensure_web(250, 10, seed=7, cache_dir=str(tmp_path / "web"))
    policy = FetchPolicy(include=IncludePatterns(domain_patterns=frozenset([".test"])))
    seeds = [spec.url_of(i) for i in range(3)]
    base = dict(spec=spec, corpus_path=corpus, seeds=seeds, policy=policy,
                fetch_concurrency=2)

    cfg_a = CrawlConfig(run_dir=str(tmp_path / "a"), **base)
    crawl(cfg_a)

    killed = []

    def kill_once(rnd, shards):
        if rnd == 2 and not killed:
            killed.append(rnd)
            ray.kill(shards[1], no_restart=True)

    cfg_b = CrawlConfig(run_dir=str(tmp_path / "b"), fault_hook=kill_once, **base)
    summary = run_with_recovery(cfg_b)
    assert killed == [2]
    assert summary.frontier_exhausted or summary.rounds > 0

    assert read_order(str(tmp_path / "a")).equals(read_order(str(tmp_path / "b")))
    da = read_crawled(str(tmp_path / "a")).to_pandas().sort_values(["round", "host", "seq"])
    db = read_crawled(str(tmp_path / "b")).to_pandas().sort_values(["round", "host", "seq"])
    assert list(da["url"]) == list(db["url"])
    assert [bytes(x) for x in da["content"]] == [bytes(x) for x in db["content"]]


def test_resume_of_quota_completed_run_is_a_noop(ray_session, tmp_path):
    """Review-found r5: resuming a quota-completed run previously executed
    one full extra round (fetching the whole frontier, trimming every doc
    to room 0) before the quota check fired — leaving order artifacts an
    undisturbed run never produces. Resume must change NOTHING."""
    from crawler_ray.fetchsim import FetchPolicy
    from crawler_ray.pipelines.checkpoint import committed_rounds, resume_crawl
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl, read_order
    from crawler_ray.urlkit import IncludePatterns
    from crawler_ray.webgen import ensure_web

    spec, corpus = ensure_web(250, 10, seed=7, cache_dir=str(tmp_path / "web"))
    policy = FetchPolicy(include=IncludePatterns(domain_patterns=frozenset([".test"])))
    seeds = [spec.url_of(i) for i in range(3)]
    cfg = CrawlConfig(
        run_dir=str(tmp_path / "q"), spec=spec, corpus_path=corpus,
        seeds=seeds, policy=policy, fetch_concurrency=2, limit=10,
    )
    s1 = crawl(cfg)
    assert s1.quota_reached and s1.stored == 10
    order_before = read_order(str(tmp_path / "q"))
    rounds_before = committed_rounds(str(tmp_path / "q"))

    s2 = resume_crawl(cfg)
    assert s2.stored == 10
    assert s2.rounds == 0  # no extra round ran
    assert committed_rounds(str(tmp_path / "q")) == rounds_before
    assert read_order(str(tmp_path / "q")).equals(order_before)


def test_stale_stop_consumed_on_natural_exit(ray_session, tmp_path):
    """Review-found r5: a stop sentinel dropped as the crawl exhausted was
    left behind and silently halted a FUTURE resume before its injections
    were applied. The finalizer must consume it."""
    import os

    from crawler_ray.fetchsim import FetchPolicy
    from crawler_ray.pipelines.checkpoint import resume_crawl
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl
    from crawler_ray.urlkit import IncludePatterns
    from crawler_ray.webgen import ensure_web

    spec, corpus = ensure_web(250, 10, seed=7, cache_dir=str(tmp_path / "web"))
    policy = FetchPolicy(include=IncludePatterns(domain_patterns=frozenset([".test"])))
    cfg = CrawlConfig(
        run_dir=str(tmp_path / "s"), spec=spec, corpus_path=corpus,
        seeds=[spec.url_of(0)], policy=policy, fetch_concurrency=2,
    )
    run_dir = str(tmp_path / "s")
    os.makedirs(os.path.join(run_dir, "inject"), exist_ok=True)
    # drop the stop BEFORE the run: consumed at round 0, halted=True
    with open(os.path.join(run_dir, "inject", "stop"), "w"):
        pass
    s1 = crawl(cfg)
    assert s1.halted
    # run to exhaustion, then drop a stop AFTER the crawl has exited: the
    # finalizer of the NEXT resume (entered via injections) must not be
    # poisoned by it. Simulate by dropping stop + a seed injection.
    s2 = resume_crawl(cfg)
    assert s2.frontier_exhausted and not s2.halted
    stop_f = os.path.join(run_dir, "inject", "stop")
    with open(stop_f, "w"):
        pass
    s3 = resume_crawl(cfg)  # exits on exhaustion; must consume stale stop
    assert not os.path.exists(stop_f), "stale stop sentinel left behind"
    with open(os.path.join(run_dir, "inject", "r5seeds.urls"), "w") as f:
        f.write(spec.url_of(5) + "\n")
    s4 = resume_crawl(cfg)
    assert not s4.halted  # injections applied, not silently halted
    # the injection was consumed (applied), not left pending behind a halt
    import glob

    assert not glob.glob(os.path.join(run_dir, "inject", "*.urls"))
