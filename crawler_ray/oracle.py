"""Single-threaded reference-semantics oracle (golden producer).

The reference crawler's cross-host interleaving is nondeterministic (20 green
threads over STM queues, /root/reference/src/Workers.hs:17-36), so per
SURVEY.md §2.7 we fix ONE canonical serialization of its semantics and
require the Ray engine to match it exactly:

- **BFS rounds**: round 0 = seeds (``processNextUrl`` per seed in list
  order, Initialisation.hs:97-119); round k+1 = surviving links discovered
  in round k.
- **Within-round order** = ``(host, seq)`` where ``seq`` is the per-host
  FIFO discovery rank (per-domain TQueue FIFO, PoliteQueue.hs:22-48).
- **Mutation convention** (one valid serialization of the reference's racy
  interleaving): during a round the seen-set is frozen at its round-start
  snapshot (the meta-refresh trap guard reads that snapshot); at round end,
  FIRST all completions/failures apply (in canonical order), THEN all
  candidate links run processNextUrl (include-filter -> checkNotDone ->
  insert in-progress, Crawl.hs:187-201) in canonical candidate order
  ``(parent_host, parent_seq, link_idx)``; within-round duplicate candidates
  keep the minimal candidate key.
- **seq assignment for round k+1**: candidates that survive dedup are sorted
  by candidate key; per target host, ``seq`` = dense rank in that order.
- **Quota** (``-l``, Crawl.hs:169-183, Main.hs:61-68): stored docs count in
  canonical order; the round that crosses the limit keeps only the first
  ``limit - stored_so_far`` docs (their links still expand — the reference
  also keeps crawling after the store quota is hit, only storing stops).

Frontier membership is decided at insert time and never re-checked at
dequeue (PoliteQueue.readQueue has no seen-check), so a URL completed by a
later round's redirect chain is still fetched if already enqueued.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .fetchsim import FetchPolicy, process_url
from .urlkit import canonicalise, get_domain
from .webgen import WebSpec


@dataclass
class OracleResult:
    # url -> 'in_progress' | 'completed' | 'failed'
    seen: dict[str, str] = field(default_factory=dict)
    # (round, host, seq, url) in canonical crawl order
    order: list[tuple[int, str, int, str]] = field(default_factory=list)
    # stored docs: dict(url, redirect_chain, page_id, round, host, seq)
    crawled: list[dict] = field(default_factory=list)
    logs: list[tuple[str, str, str]] = field(default_factory=list)
    rounds: int = 0
    # final shared cookie list (name -> value), Crawl.hs getCookieList
    cookies: dict[str, str] = field(default_factory=dict)


def run_oracle(
    spec: WebSpec,
    policy: FetchPolicy,
    seeds: list[str],
    limit: int | None = None,
    max_rounds: int = 50,
) -> OracleResult:
    res = OracleResult()
    seen = res.seen

    def check_not_done(url: str) -> bool:
        return url not in seen  # any status rejects (Crawl.hs:203-212)

    # --- seeds (round 0 frontier) --------------------------------------
    frontier: list[tuple[str, int, str]] = []  # (host, seq, url)
    per_host_count: dict[str, int] = {}
    for s in seeds:
        cu = canonicalise(s)
        if cu is None:
            continue
        if not policy.include.accepts(cu):
            continue
        if not check_not_done(cu):
            continue
        seen[cu] = "in_progress"
        host = get_domain(cu) or ""
        seq = per_host_count.get(host, 0)
        per_host_count[host] = seq + 1
        frontier.append((host, seq, cu))

    stored_total = 0
    rnd = 0
    while frontier and rnd < max_rounds:
        frontier.sort(key=lambda t: (t[0], t[1]))
        snapshot = dict(seen)  # trap guard reads round-start state
        # cookie list likewise frozen at its round-start snapshot (one
        # valid serialization of the reference's racy shared TVar,
        # Crawl.hs:106); shared cookies apply at round end below
        csnap = tuple(sorted(res.cookies.items()))

        outcomes = []
        for host, seq, url in frontier:
            res.order.append((rnd, host, seq, url))
            out = process_url(spec, policy, url, lambda u: u in snapshot, cookies=csnap)
            outcomes.append((host, seq, out))

        # --- apply completions/failures in canonical order -------------
        round_docs = []
        candidates: list[tuple[str, int, int, str]] = []  # (p_host,p_seq,idx,url)
        for host, seq, out in outcomes:
            if out.status == "stored":
                seen.pop(out.url, None)  # S.delete in-progress (Crawl.hs:173)
                for u in out.completed:
                    seen[u] = "completed"
                for n, v in out.shared_cookies:  # shareCookies (Crawl.hs:159)
                    res.cookies[n] = v
                round_docs.append((host, seq, out))
                for idx, link in enumerate(out.links):
                    candidates.append((host, seq, idx, link))
                res.logs.extend(out.logs)
            elif out.status == "failed":
                seen[out.url] = "failed"
                res.logs.append(("error", out.url, out.reason))
            # 'excluded' and 'meta_trap': URL stays in_progress (quirk, see
            # fetchsim module doc); nothing stored, no links.

        # --- quota cut (canonical order) --------------------------------
        if limit is not None:
            room = max(0, limit - stored_total)
            kept = round_docs[:room]
        else:
            kept = round_docs
        stored_total += len(kept)
        for host, seq, out in kept:
            res.crawled.append(
                {
                    "url": out.url,
                    "redirect_chain": list(out.redirect_chain),
                    "page_id": out.page_id,
                    "round": rnd,
                    "host": host,
                    "seq": seq,
                    "body": out.body,
                }
            )

        # --- candidate inserts (processNextUrl, canonical order) --------
        candidates.sort(key=lambda c: (c[0], c[1], c[2]))
        next_frontier: list[tuple[str, int, str]] = []
        per_host_count = {}
        inserted: set[str] = set()
        for p_host, p_seq, idx, link in candidates:
            if link in inserted:
                continue  # within-round dup: minimal key won
            if not policy.include.accepts(link):
                continue
            if not check_not_done(link):
                continue
            inserted.add(link)
            seen[link] = "in_progress"
            host = get_domain(link) or ""
            seq = per_host_count.get(host, 0)
            per_host_count[host] = seq + 1
            next_frontier.append((host, seq, link))

        frontier = next_frontier
        rnd += 1
        # the reference halts on quota (Main.hs:61-66); canonical rule:
        # stop expanding once the limit is reached
        if limit is not None and stored_total >= limit:
            break

    res.rounds = rnd
    return res
