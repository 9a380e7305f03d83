"""MmapShardCorpus: the Lance-equivalent random-access corpus store.

Covers the lazy parquet -> uncompressed Arrow IPC conversion, ordered
cross-shard ``take_pages``, the missing-id error path, and engine/oracle
parity when the crawl's docs sink reads payloads through the mmap store
(the fast path `open_corpus` picks for writable sharded directories).
"""

import os

import pytest

from crawler_ray.fetchsim import FetchPolicy
from crawler_ray.oracle import run_oracle
from crawler_ray.pipelines.crawl import CrawlConfig, crawl, read_crawled
from crawler_ray.sources.corpus import (
    MmapShardCorpus,
    ShardedParquetCorpusStore,
    open_corpus,
)
from crawler_ray.urlkit import IncludePatterns
from crawler_ray.webgen import ensure_web_sharded

N_PAGES, N_HOSTS, N_SHARDS = 1200, 48, 8


@pytest.fixture(scope="module")
def sharded_web(tmp_path_factory):
    cache = tmp_path_factory.mktemp("shardedweb")
    return ensure_web_sharded(
        N_PAGES, N_HOSTS, N_SHARDS, seed=11, cache_dir=str(cache)
    )


def test_open_corpus_prefers_mmap_when_writable(sharded_web):
    _, path = sharded_web
    assert isinstance(open_corpus(path), MmapShardCorpus)


def test_take_pages_matches_parquet_store(sharded_web):
    spec, path = sharded_web
    mm = MmapShardCorpus(path)
    pqs = ShardedParquetCorpusStore(path)
    # ids spanning several shards, deliberately unsorted with a duplicate
    ids = [7, 411, 3, 1199, 411, 500, 42]
    a = mm.take_pages(ids)
    b = pqs.take([spec.image_id(p) for p in ids])
    assert a.column_names == b.column_names
    assert a.to_pylist() == b.to_pylist()
    # conversion is lazy: only the touched shards materialised .arrow
    n_arrow = len([f for f in os.listdir(path) if f.endswith(".arrow")])
    assert 0 < n_arrow <= N_SHARDS


def test_take_pages_missing_id_raises(sharded_web):
    _, path = sharded_web
    with pytest.raises(KeyError):
        MmapShardCorpus(path).take_pages([N_PAGES + 5])


def test_sharded_crawl_matches_oracle(ray_session, sharded_web, tmp_path):
    spec, corpus_path = sharded_web
    policy = FetchPolicy(
        include=IncludePatterns(domain_patterns=frozenset([".test"]))
    )
    seeds = [spec.url_of(i) for i in range(6)]
    cfg = CrawlConfig(
        spec=spec,
        corpus_path=corpus_path,
        seeds=seeds,
        policy=policy,
        run_dir=str(tmp_path / "run"),
        n_fetch_shards=4,
        n_seen_shards=2,
        verify_payload=True,  # per-row pixel/caption invariant inline
    )
    summary = crawl(cfg)
    golden = run_oracle(spec, policy, seeds)
    docs = read_crawled(str(tmp_path / "run")).to_pandas()
    assert set(docs["url"]) == {d["url"] for d in golden.crawled}
    assert summary.stored == len(golden.crawled)
    # payload columns came through the mmap store: captions match the spec
    cap = {d["url"]: spec.caption_of(d["page_id"]) for d in golden.crawled}
    assert all(cap[u] == c for u, c in zip(docs["url"], docs["caption"]))
