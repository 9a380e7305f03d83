"""Per-URL fetch + processResult chain: the reference's worker-loop core.

Reimplements the semantics of /root/reference/src/Crawl.hs:92-185 and
Fetch.hs:29-70 as a pure, deterministic function over the synthetic web
(webgen.WebSpec standing in for HTTP). This module is shared by BOTH the
single-threaded oracle (oracle.py) and the distributed Ray fetch stage
(stages/fetch.py), so crawl-order/seen-set parity between them holds by
construction — each side only supplies scheduling.

Precedence per processResult (Crawl.hs:117-153):
  1. href direction match on the landed body  -> GET it, recurse
  2. meta-refresh (resolved against the ORIGINALLY REQUESTED url — the
     reference passes ``nextUrl`` not ``head redirects``, Crawl.hs:132) ->
     if target not already done (trap guard, Crawl.hs:138-140) GET it, recurse
  3. applicable form instruction                -> submit it, recurse
  4. store: include-check the LANDED url (Crawl.hs:157), mark the innermost
     fetch's redirect chain completed, emit hrefs (Crawl.hs:156-162)

Faithfully-kept reference quirks (documented, matched by the oracle):
- Only the INNERMOST fetch's chain is marked completed
  (Crawl.hs:169-174 closes over the innermost ``redirects``); the original
  frontier URL is merely removed from in-progress when a sub-fetch chain
  (direction/meta/form) occurred, so it can be legally re-enqueued later.
- A meta-refresh whose target is already done stores NOTHING and leaves the
  frontier URL in-progress forever (Crawl.hs:138-143 ``when`` with no else).
- Stored redirect_chain order is the reference's: landed-first,
  originally-requested-last (Fetch.hs:42 builds [landed..requested]); WARC
  record-id/target-uri = last element (WarcDocument.hs:27-29).

Deviations required for a sane distributed engine (SURVEY.md §4):
- fetch errors (404 / too-many-redirects / robots-disallowed / hop-cap) mark
  the URL ``failed`` instead of killing a worker thread; the reference's
  ``urlsFailed`` map exists but is never written (Types.hs:36).
- robots.txt gating (absent in the reference, required by the north rule):
  requested URLs and sub-fetch targets are checked against per-host rules.
- sub-fetch recursion depth capped (``max_hops``) — the reference can
  recurse unboundedly.
- a meta-refresh whose target derelativises to a warning/error is treated
  as NO redirect and processing continues to the form/store steps; the
  reference crashes the worker thread (``error`` at Parse.hs:29-30),
  wedging that URL in-progress forever. Deliberate: a crash-on-bad-markup
  is not a behavior worth mirroring in a distributed engine (review r5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from .configs import FormInstruction, HrefDirection
from .formlogic import find_direction, select_form_options
from .html import scan_page
from .urlkit import IncludePatterns, derelativise, get_domain
from .webgen import WebSpec

MAX_REDIRECTS = 20  # Settings.hs:17-18
MAX_CONTENT_LENGTH = 20 * 1024 * 1024  # Settings.hs:20-21
MAX_HOPS = 8  # engine cap on direction/meta/form recursion (see module doc)


DEFAULT_USER_AGENT = (
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:44.0) "
    "Gecko/20100101 Crawler/0.1"
)  # Settings.hs:30


@dataclass(frozen=True)
class FetchPolicy:
    include: IncludePatterns
    form_instructions: dict[str, FormInstruction] = field(default_factory=dict)
    directions: tuple[HrefDirection, ...] = ()
    robots_enabled: bool = True
    max_redirects: int = MAX_REDIRECTS
    max_hops: int = MAX_HOPS
    max_content_length: int = MAX_CONTENT_LENGTH
    # real-HTTP config surface (Request.hs:24-45, Settings.hs:11-31): the
    # synthetic-web fetcher has no transport, so these are carried but
    # unused here — a live-HTTP fetcher swap-in reads them when building
    # each request (applyProxy / applyBasicAuth / headers / TLS settings)
    user_agent: str = DEFAULT_USER_AGENT
    proxy: tuple[str, int] | None = None  # ProxySettings (addr, port)
    basic_auth: tuple[str, str] | None = None  # basicAuthSettings
    ignore_bad_https_certs: bool = True  # Settings.hs:14-15


@dataclass
class FetchResult:
    """One simulated HTTP GET/POST with redirect following (Fetch.hs:29-70)."""

    ok: bool
    chain: list[str]  # reference order: landed-first, requested-last
    body: str
    page_id: int | None
    error: str = ""
    # cookies the response set (Fetch.hs:40 destroyCookieJar . responseCookieJar)
    set_cookies: tuple[tuple[str, str], ...] = ()


@dataclass
class ProcessOutcome:
    url: str
    # 'stored' | 'excluded' | 'failed' | 'meta_trap'
    status: str
    reason: str = ""
    redirect_chain: list[str] = field(default_factory=list)  # of innermost fetch
    completed: list[str] = field(default_factory=list)  # urls to mark completed
    body: str = ""
    page_id: int | None = None  # landed page (payload row)
    links: list[str] = field(default_factory=list)  # canonical, discovery order
    logs: list[tuple[str, str, str]] = field(default_factory=list)  # kind,url,detail
    hops: int = 0  # sub-fetch chain length (direction/meta/form)
    # new cookies the final response set that were NOT in its request's jar
    # (shareCookies (responseCookies \\ cookiesSent), Crawl.hs:159-167);
    # only populated for stored+included outcomes
    shared_cookies: list[tuple[str, str]] = field(default_factory=list)


def robots_allowed(spec: WebSpec, policy: FetchPolicy, url: str) -> bool:
    if not policy.robots_enabled:
        return True
    domain = get_domain(url)
    if domain is None or not domain.startswith("host") or not domain.endswith(".test"):
        return True
    try:
        h = int(domain[4:-5])
    except ValueError:
        return True
    path = url.split(".test", 1)[1] if ".test" in url else "/"
    return not any(path.startswith(p) for p in spec.robots_disallow(h))


def request_url(request) -> str:
    """URL of a GET (plain string) or form-submission request."""
    return request if isinstance(request, str) else request.target_url


def simulate_fetch(
    spec: WebSpec,
    policy: FetchPolicy,
    request,
    cookies: tuple[tuple[str, str], ...] = (),
) -> FetchResult:
    """One HTTP exchange against the synthetic web, following redirects.

    ``request`` is a URL string (GetRequest) or a formlogic.FormRequest
    whose merged params are transmitted — urlencoded body for POST, query
    string otherwise (Request.hs:33 applyParametersFrom,
    DownloadRequest.hs:15-34). ``cookies`` is the request's cookie jar
    (Request.hs:36 createCookieJar requestCookies).
    """
    if isinstance(request, str):
        url, method, params = request, "GET", ()
    else:
        url, method, params = request.target_url, request.method, request.params
    kind, page_id, set_cookies = spec.resolve_request(
        url, method=method, params=params, cookies=tuple(cookies)
    )
    if kind == "notfound":
        return FetchResult(False, [url], "", None, "HTTP 404")

    def _sized(fr: FetchResult) -> FetchResult:
        # HttpUtil.hs:12-25 checkSize: a declared Content-Length above the
        # cap FAILS the fetch (the reference then also truncates the body
        # stream, Fetch.hs:37 — dead code here since declared == actual)
        if len(fr.body) > policy.max_content_length:
            return FetchResult(
                False, fr.chain[-1:], "", None,
                f"Content-Length exceeded {policy.max_content_length}",
            )
        return fr

    if kind == "submit":
        body = spec.render_page(page_id, spec.caption_of(page_id))
        return _sized(FetchResult(True, [url], body, page_id, set_cookies=set_cookies))
    # kind == "page"
    if spec.kind_of(page_id) == "redirect":
        visit_chain, target = spec.redirect_chain(page_id)
        # Fetch.hs:58 'go _ 0 _' errors when the counter reaches 0: at most
        # maxRedirects-1 follows succeed (off-by-one kept, ADVICE r1)
        if len(visit_chain) - 1 >= policy.max_redirects:
            return FetchResult(False, [url], "", None, "Too many redirects")
        if spec.page_gated(target, tuple(cookies)):
            # the redirect landed on a session-gated page without the cookie
            return FetchResult(False, [url], "", None, "HTTP 404")
        body = spec.render_page(target, spec.caption_of(target))
        # reference order: landed first, requested last (Fetch.hs:42)
        return _sized(FetchResult(True, list(reversed(visit_chain)), body, target))
    body = spec.render_page(page_id, spec.caption_of(page_id))
    return _sized(FetchResult(True, [url], body, page_id))


def process_url(
    spec: WebSpec,
    policy: FetchPolicy,
    url: str,
    is_done: Callable[[str], bool],
    cookies: tuple[tuple[str, str], ...] = (),
    fetch: Callable | None = None,
) -> ProcessOutcome:
    """The full worker iteration for one frontier URL (Crawl.hs:104-162).

    ``is_done`` answers the meta-refresh trap guard's checkNotDone
    (Crawl.hs:138; any of completed/in-progress/failed -> True).
    ``cookies`` is the shared cookie list's snapshot at dequeue time
    (Crawl.hs:106 readTVarIO getCookieList); each sub-fetch sends
    ``responseCookies ++ cookiesSent`` (Crawl.hs:124,137,149), and a stored
    outcome reports the final response's NEW cookies for round-end sharing.

    ``fetch`` is the transport: ``(request, cookie_jar) -> FetchResult``.
    Default is the synthetic-web ``simulate_fetch``; pass
    ``livefetch.LiveFetcher(policy).fetch`` to run the identical chain
    logic over real HTTP (the spec is then only consulted by the robots
    gate, which short-circuits when ``policy.robots_enabled`` is False).
    """
    if fetch is None:
        def fetch(request, jar):
            return simulate_fetch(spec, policy, request, jar)

    out = ProcessOutcome(url=url, status="failed")

    if not robots_allowed(spec, policy, url):
        out.reason = "robots_disallowed"
        return out

    sent = tuple(cookies)
    fr = fetch(url, sent)
    hops = 0
    while True:
        if not fr.ok:
            out.status = "failed"
            out.reason = fr.error
            return out
        landed = fr.chain[0]
        # 1. href direction (Crawl.hs:123-129) — needs only the raw body,
        #    so it runs BEFORE the tag scan: on direction hops the scan's
        #    results were computed and thrown away (review r5)
        direction = find_direction(list(policy.directions), landed, fr.body)
        next_request = None  # URL string (GET) or FormRequest
        if direction is not None:
            next_request = direction
        else:
            # fused single-pass extraction (== get_raw_hrefs/
            # find_meta_refresh/get_forms over parse_tags; equivalence-
            # tested) — forms skipped when no form instruction could ever
            # consume them; only needed for steps 2-4 below
            raw_hrefs, raw_meta, forms = scan_page(
                fr.body, want_forms=bool(policy.form_instructions)
            )
            # 2. meta refresh, resolved against the original request url
            #    (Crawl.hs:132 passes nextUrl)
            meta_url = None
            if raw_meta is not None:
                k, v = derelativise(url, raw_meta)
                if k == "url":
                    meta_url = v
            if meta_url is not None:
                if is_done(meta_url):
                    # trap guard fired: nothing stored, URL stays in-progress
                    # (Crawl.hs:138-143)
                    out.status = "meta_trap"
                    out.reason = "meta refresh target already done"
                    out.hops = hops
                    return out
                next_request = meta_url
            else:
                # 3. form instruction (Crawl.hs:147-152) — the submission
                #    transmits method + merged params (Request.hs:33)
                try:
                    form_req = select_form_options(
                        policy.form_instructions, landed, forms
                    )
                except ValueError as e:
                    out.status = "failed"
                    out.reason = str(e)
                    return out
                if form_req is not None:
                    next_request = form_req

        if next_request is not None:
            hops += 1
            if hops > policy.max_hops:
                out.status = "failed"
                out.reason = "too many sub-fetch hops"
                out.hops = hops
                return out
            if not robots_allowed(spec, policy, request_url(next_request)):
                out.status = "failed"
                out.reason = "robots_disallowed (sub-fetch)"
                out.hops = hops
                return out
            # recurse: attribution stays with the original ``url``; the meta
            # resolution base stays the *original* nextUrl at every level
            # (Crawl.hs:132); moreCookies = responseCookies ++ cookiesSent
            sent = tuple(fr.set_cookies) + sent
            fr = fetch(next_request, sent)
            continue

        # 4. store (Crawl.hs:153,156-162)
        out.hops = hops
        out.redirect_chain = list(fr.chain)
        out.body = fr.body
        out.page_id = fr.page_id
        if not policy.include.accepts(landed):
            out.status = "excluded"
            out.reason = "landed url not in include patterns"
            return out
        out.status = "stored"
        out.completed = list(fr.chain)  # innermost chain only (Crawl.hs:174)
        # shareCookies (responseCookies \\ cookiesSent), inside 'when
        # included' (Crawl.hs:158-159): new cookies of the FINAL response
        out.shared_cookies = [c for c in fr.set_cookies if c not in sent]
        for raw in raw_hrefs:
            k, v = derelativise(landed, raw)
            if k == "url":
                out.links.append(v)
            else:
                out.logs.append((k, landed, v))
        return out
