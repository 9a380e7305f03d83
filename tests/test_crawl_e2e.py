"""End-to-end: Ray crawl engine vs single-threaded oracle.

Parity gates (SURVEY.md §5): final seen-set equality, canonical
(round, host, seq) crawl-order equality, stored-doc set equality, per-row
payload invariant (decoded pixels + caption vs corpus), politeness
(no overlapping fetches per host), quota, determinism across shard counts.
"""

import collections
import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from crawler_ray.codecs import decode_image, psnr
from crawler_ray.fetchsim import FetchPolicy
from crawler_ray.oracle import run_oracle
from crawler_ray.pipelines.crawl import CrawlConfig, crawl, read_crawled, read_order
from crawler_ray.state.seen import STATUS_NAMES, make_shards
from crawler_ray.urlkit import IncludePatterns
from crawler_ray.webgen import WebSpec, ensure_web

import ray

N_PAGES, N_HOSTS = 300, 12


@pytest.fixture(scope="module")
def web(tmp_path_factory):
    cache = tmp_path_factory.mktemp("web")
    spec, corpus_path = ensure_web(N_PAGES, N_HOSTS, seed=42, cache_dir=str(cache))
    return spec, corpus_path


@pytest.fixture(scope="module")
def policy():
    return FetchPolicy(include=IncludePatterns(domain_patterns=frozenset([".test"])))


def _run_engine(web, policy, tmp, seeds, limit=None, **kw):
    kw.setdefault("fetch_concurrency", 2)
    spec, corpus_path = web
    cfg = CrawlConfig(
        spec=spec,
        corpus_path=corpus_path,
        seeds=seeds,
        policy=policy,
        run_dir=str(tmp),
        limit=limit,
        **kw,
    )
    shards = make_shards(cfg.n_seen_shards, cfg.seen_capacity_per_shard)
    summary = crawl(cfg, shards=shards)
    seen = {}
    for t in ray.get([s.full_table.remote() for s in shards]):
        for u, c in zip(t["url"].to_pylist(), t["status"].to_pylist()):
            seen[u] = STATUS_NAMES[c]
    return summary, seen


def test_engine_matches_oracle(ray_session, web, policy, tmp_path):
    spec, _ = web
    seeds = [spec.url_of(i) for i in range(4)]
    golden = run_oracle(spec, policy, seeds)
    summary, seen = _run_engine(web, policy, tmp_path / "run", seeds)

    assert seen == golden.seen

    order = read_order(str(tmp_path / "run"))
    got = list(
        zip(
            order["round"].to_pylist(),
            order["host"].to_pylist(),
            order["seq"].to_pylist(),
            order["url"].to_pylist(),
        )
    )
    want = sorted(golden.order)
    assert got == want

    docs = read_crawled(str(tmp_path / "run")).to_pandas()
    want_docs = {(d["url"], d["round"], d["host"], d["seq"]) for d in golden.crawled}
    got_docs = set(zip(docs["url"], docs["round"], docs["host"], docs["seq"]))
    assert got_docs == want_docs
    # redirect chains match
    gold_chain = {d["url"]: d["redirect_chain"] for d in golden.crawled}
    for _, row in docs.iterrows():
        assert list(row["redirect_chain"]) == gold_chain[row["url"]]


def test_payload_invariant(ray_session, web, policy, tmp_path):
    """input_hint: decoded-pixel allclose (PSNR>=40 lossy) + caption eq."""
    spec, _ = web
    seeds = [spec.url_of(0)]
    _run_engine(web, policy, tmp_path / "run", seeds, limit=40)
    docs = read_crawled(str(tmp_path / "run")).to_pandas()
    assert len(docs) == 40
    for _, row in docs.iterrows():
        pid = int(row["image_id"][3:])
        expect = spec.pixels_of(pid)
        got = decode_image(row["image_bytes"])
        if row["fmt"] == "jpeg":
            assert psnr(expect, got) >= 40.0
        else:
            assert np.array_equal(expect, got)
        assert row["caption"] == spec.caption_of(pid)
        assert row["phash"] is not None


def test_inline_verify_payload_column(ray_session, web, policy, tmp_path):
    """verify_payload=True: the docs sink's BATCHED invariant (shape-
    grouped PSNR / exact pixels / phash, stages/fetch.py) must agree with
    the per-image formulation — every stored doc gets payload_ok=1 on an
    untampered corpus, covering all three formats."""
    spec, _ = web
    seeds = [spec.url_of(i) for i in range(4)]
    _run_engine(web, policy, tmp_path / "run", seeds, verify_payload=True)
    docs = read_crawled(str(tmp_path / "run")).to_pandas()
    assert len(docs) > 50
    assert set(docs["fmt"]) == {"bmp", "png", "jpeg"}  # all codecs hit
    assert (docs["payload_ok"] == 1).all()
    # cross-check a sample against the per-image reference formulation
    from crawler_ray.codecs import perceptual_hash

    for _, row in docs.head(24).iterrows():
        pid = int(row["image_id"][3:])
        expect = spec.pixels_of(pid)
        got = decode_image(row["image_bytes"])
        ok = (
            (psnr(expect, got) >= 40.0 if row["fmt"] == "jpeg"
             else np.array_equal(expect, got))
            and row["caption"] == spec.caption_of(pid)
            and perceptual_hash(expect) == row["phash"]
        )
        assert ok == bool(row["payload_ok"])


def test_determinism_across_shard_counts(ray_session, web, policy, tmp_path):
    """Metamorphic: different fetch/seen shard counts -> identical outputs."""
    spec, _ = web
    seeds = [spec.url_of(i) for i in range(3)]
    s1, seen1 = _run_engine(
        web, policy, tmp_path / "a", seeds, n_fetch_shards=4, n_seen_shards=2,
        fetch_concurrency=2,
    )
    s2, seen2 = _run_engine(
        web, policy, tmp_path / "b", seeds, n_fetch_shards=32, n_seen_shards=16,
        fetch_concurrency=3,
    )
    assert seen1 == seen2
    o1, o2 = read_order(str(tmp_path / "a")), read_order(str(tmp_path / "b"))
    assert o1["url"].to_pylist() == o2["url"].to_pylist()
    assert o1["seq"].to_pylist() == o2["seq"].to_pylist()


def test_quota_matches_oracle(ray_session, web, policy, tmp_path):
    spec, _ = web
    seeds = [spec.url_of(i) for i in range(3)]
    golden = run_oracle(spec, policy, seeds, limit=25)
    summary, _ = _run_engine(web, policy, tmp_path / "run", seeds, limit=25)
    assert summary.stored == 25
    docs = read_crawled(str(tmp_path / "run")).to_pandas()
    assert set(docs["url"]) == {d["url"] for d in golden.crawled}


def test_politeness_no_host_overlap(ray_session, web, policy, tmp_path):
    """No two fetches of the same host may overlap in time (the reference's
    one-in-flight-per-host invariant, PoliteQueue.hs:34-64)."""
    spec, _ = web
    seeds = [spec.url_of(i) for i in range(4)]
    _run_engine(
        web, policy, tmp_path / "run", seeds,
        record_metrics=True, politeness_delay=0.0, fetch_concurrency=2,
    )
    files = glob.glob(str(tmp_path / "run" / "round_*" / "metrics" / "*.parquet"))
    assert files
    import pyarrow as pa

    t = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
    overlaps = 0
    for host, g in t.groupby("host"):
        g = g.sort_values("t_start")
        prev_end = -1.0
        for _, r in g.iterrows():
            if r["t_start"] < prev_end - 1e-9:
                overlaps += 1
            prev_end = max(prev_end, r["t_end"])
    assert overlaps == 0


def test_checkpoint_artifacts_exist(ray_session, web, policy, tmp_path):
    spec, _ = web
    _run_engine(web, policy, tmp_path / "run", [spec.url_of(0)], max_rounds=2)
    rdirs = sorted(glob.glob(str(tmp_path / "run" / "round_*")))
    assert rdirs
    for rdir in rdirs:
        assert os.path.exists(os.path.join(rdir, "MANIFEST.json"))
        assert glob.glob(os.path.join(rdir, "seen_delta", "*.parquet"))
    assert os.path.exists(str(tmp_path / "run" / "RUN_MANIFEST.json"))
