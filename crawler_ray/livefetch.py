"""Live HTTP transport: the real-network implementation of the fetch
contract (``(request, cookie_jar) -> FetchResult``).

This is the swap-in for the reference's http-client transport
(/root/reference/src/Fetch.hs:29-70, Request.hs:15-45): everything else in
the engine — the per-URL chain logic (fetchsim.process_url), the frontier /
seen-set machinery, the docs sink — is transport-agnostic. The synthetic
web remains the default (this sandbox has no network); ``LiveFetcher`` is
exercised by tests/test_livefetch.py against a localhost ``http.server``
mini-site.

Honored FetchPolicy surface (Request.hs:24-45, Settings.hs:11-31):
- ``user_agent``       -> User-Agent header (Settings.hs:30 applyUserAgent)
- ``basic_auth``       -> Authorization: Basic (applyBasicAuth)
- ``proxy``            -> HTTP(S) proxy (applyProxy / ProxySettings)
- ``ignore_bad_https_certs`` -> unverified TLS context (Settings.hs:14-15)
- ``max_redirects``    -> manual redirect following, Fetch.hs:58 semantics
  (the counter errors when it REACHES zero: at most max_redirects-1
  follows succeed — the same off-by-one the synthetic fetcher keeps)
- ``max_content_length`` -> a DECLARED Content-Length above the cap fails
  the fetch (HttpUtil.hs:12-25 checkSize); an undeclared body is read at
  most cap+1 bytes and fails if it exceeds the cap

Semantics matched to fetchsim.simulate_fetch:
- chain is the reference's order: landed FIRST, originally-requested LAST
  (Fetch.hs:42); redirect hops in between, newest-first
- form submissions (formlogic.FormRequest) transmit merged params as an
  urlencoded POST body, or as the query string for GET forms
  (Request.hs:33 applyParametersFrom, DownloadRequest.hs:15-34)
- the request's cookie jar is sent as a Cookie header; ``set_cookies`` is
  every name=value the response chain set (Fetch.hs:40 destroyCookieJar)
"""

from __future__ import annotations

import base64
import http.client
import ssl
import urllib.error
import urllib.parse
import urllib.request

from .fetchsim import FetchPolicy, FetchResult


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """Disable urllib's auto-redirects: the chain must be built manually
    (order + cap semantics) and cookies re-sent per hop."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


class LiveFetcher:
    """One fetcher per worker (holds the opener — the reference's shared
    ``Manager``, Crawl.hs:42-44). Not used by the synthetic benchmarks;
    see module doc."""

    def __init__(self, policy: FetchPolicy, timeout: float = 30.0):
        self.policy = policy
        self.timeout = timeout
        handlers: list = [_NoRedirect()]
        if policy.proxy is not None:
            addr, port = policy.proxy
            proxy_url = f"http://{addr}:{port}"
            handlers.append(
                urllib.request.ProxyHandler(
                    {"http": proxy_url, "https": proxy_url}
                )
            )
        if policy.ignore_bad_https_certs:
            ctx = ssl.create_default_context()
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            handlers.append(urllib.request.HTTPSHandler(context=ctx))
        self.opener = urllib.request.build_opener(*handlers)

    # -- single HTTP exchange (no redirect following) -------------------
    def _one(self, url: str, method: str, body: bytes | None,
             cookies: tuple[tuple[str, str], ...]):
        """(status, landed_headers, body_text, set_cookies) or raises."""
        headers = {"User-Agent": self.policy.user_agent}
        if self.policy.basic_auth is not None:
            user, pw = self.policy.basic_auth
            tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
            headers["Authorization"] = f"Basic {tok}"
        if cookies:
            headers["Cookie"] = "; ".join(f"{n}={v}" for n, v in cookies)
        if body is not None:
            headers["Content-Type"] = "application/x-www-form-urlencoded"
        req = urllib.request.Request(
            url, data=body, headers=headers, method=method
        )
        try:
            resp = self.opener.open(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            if e.code in (301, 302, 303, 307, 308):
                # urllib raises for redirects once auto-follow is off
                resp = e
            else:
                e.close()
                return e.code, {}, "", ()
        with resp:
            status = resp.status if hasattr(resp, "status") else resp.code
            hdrs = resp.headers
            set_cookies = []
            for sc in hdrs.get_all("Set-Cookie") or []:
                nv = sc.split(";", 1)[0]
                if "=" in nv:
                    n, v = nv.split("=", 1)
                    set_cookies.append((n.strip(), v.strip()))
            if status in (301, 302, 303, 307, 308):
                return status, hdrs, "", tuple(set_cookies)
            declared = hdrs.get("Content-Length")
            cap = self.policy.max_content_length
            if declared is not None and int(declared) > cap:
                raise ValueError(f"Content-Length exceeded {cap}")
            raw = resp.read(cap + 1)
            if len(raw) > cap:
                raise ValueError(f"Content-Length exceeded {cap}")
            return status, hdrs, raw.decode("utf-8", "replace"), tuple(set_cookies)

    # -- the fetch contract ---------------------------------------------
    def fetch(self, request, cookies: tuple[tuple[str, str], ...] = ()) -> FetchResult:
        """GET a URL string or submit a formlogic.FormRequest, following
        redirects; see module doc for the honored policy surface."""
        if isinstance(request, str):
            url, method, body = request, "GET", None
        else:
            enc = urllib.parse.urlencode(list(request.params))
            if request.method.upper() == "POST":
                url, method, body = request.target_url, "POST", enc.encode()
            else:
                sep = "&" if "?" in request.target_url else "?"
                url = request.target_url + (sep + enc if enc else "")
                method, body = "GET", None
        visit_chain = [url]  # visit order; reversed into reference order
        all_set: list[tuple[str, str]] = []
        jar = tuple(cookies)
        hops = 0
        while True:
            try:
                status, hdrs, text, set_c = self._one(
                    visit_chain[-1], method, body, jar
                )
            except (ValueError, OSError, http.client.HTTPException) as e:
                # HTTPException (IncompleteRead/BadStatusLine/LineTooLong)
                # is NOT an OSError — urllib only wraps connection-phase
                # errors in URLError; a truncated body or malformed status
                # line must fail ONE url, not kill the shard's fetch task
                # (review r5)
                return FetchResult(False, [url], "", None, str(e))
            all_set.extend(set_c)
            # moreCookies = responseCookies ++ cookiesSent per hop
            jar = tuple(set_c) + jar
            if status in (301, 302, 303, 307, 308):
                hops += 1
                # Fetch.hs:58 'go _ 0 _' errors at zero: max-1 follows
                if hops >= self.policy.max_redirects:
                    return FetchResult(False, [url], "", None, "Too many redirects")
                loc = hdrs.get("Location")
                if not loc:
                    return FetchResult(False, [url], "", None, "redirect without Location")
                visit_chain.append(
                    urllib.parse.urljoin(visit_chain[-1], loc)
                )
                # http-client's getRedirectedRequest semantics (Fetch.hs:
                # 29-70): 301/302/303 re-issue as GET with the body
                # dropped; 307/308 preserve the method and body (a form
                # POST answered by a 307 stays a POST)
                if status in (301, 302, 303):
                    method, body = "GET", None
                continue
            if status != 200:
                return FetchResult(False, [url], "", None, f"HTTP {status}")
            return FetchResult(
                True,
                list(reversed(visit_chain)),  # landed-first (Fetch.hs:42)
                text,
                None,  # no synthetic page id on the live path
                set_cookies=tuple(all_set),
            )
