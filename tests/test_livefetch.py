"""LiveFetcher against a localhost http.server mini-site: the live-HTTP
transport door (VERDICT r2 #8). The chain logic under test is the SAME
fetchsim.process_url the synthetic engine runs — only the transport
differs — so redirect-chain order, form POST transmission, cookie carry
and the content-size guard are exercised over a real socket."""

from __future__ import annotations

import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from crawler_ray.configs import parse_form_instructions
from crawler_ray.fetchsim import FetchPolicy, process_url
from crawler_ray.livefetch import LiveFetcher
from crawler_ray.urlkit import IncludePatterns, canonicalise

USER, PW = "admin", "pw123"
COOKIE = ("sess", "tok99")

PAGES = {
    "/": '<html><body><a href="/a">a</a><a href="b">b</a>'
         '<a href="/r">r</a><a href="/meta">m</a><a href="/form">f</a>'
         "</body></html>",
    "/a": '<html><body><a href="/">home</a></body></html>',
    "/b": "<html><body>leaf</body></html>",
    "/target": "<html><body>landed</body></html>",
    "/meta": '<html><head><meta http-equiv="refresh" content="0; url=/fresh">'
             "</head><body></body></html>",
    "/fresh": "<html><body>fresh</body></html>",
    "/form": '<html><body><form action="/login" method="post">'
             '<input name="username" value=""><input name="password" value="">'
             "</form></body></html>",
    "/loggedin": '<html><body><a href="/secret">s</a></body></html>',
    "/secret": "<html><body>secret page</body></html>",
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _page(self, body: str, headers=()):
        raw = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(raw)))
        for k, v in headers:
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(raw)

    def do_GET(self):
        self.server.requests.append((self.path, dict(self.headers)))
        if self.path == "/r":
            self.send_response(302)
            self.send_header("Location", "/target")
            self.end_headers()
            return
        if self.path == "/loop":
            self.send_response(302)
            self.send_header("Location", "/loop")
            self.end_headers()
            return
        if self.path == "/big":
            self.send_response(200)
            self.send_header("Content-Length", str(10**9))
            self.end_headers()
            self.wfile.write(b"tiny")
            return
        if self.path == "/secret":
            cookie = self.headers.get("Cookie", "")
            if f"{COOKIE[0]}={COOKIE[1]}" not in cookie:
                self.send_response(404)
                self.end_headers()
                return
        body = PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self._page(body)

    def do_POST(self):
        self.server.requests.append((self.path, dict(self.headers)))
        n = int(self.headers.get("Content-Length", 0))
        params = dict(urllib.parse.parse_qsl(self.rfile.read(n).decode()))
        if self.path == "/relay307":
            # 307 must preserve method and body on re-issue
            self.send_response(307)
            self.send_header("Location", "/login")
            self.end_headers()
            return
        if self.path == "/relay303":
            # 303 converts the POST to a body-less GET
            self.send_response(303)
            self.send_header("Location", "/b")
            self.end_headers()
            return
        if self.path == "/login":
            if params.get("username") == USER and params.get("password") == PW:
                self._page(
                    PAGES["/loggedin"],
                    [("Set-Cookie", f"{COOKIE[0]}={COOKIE[1]}; Path=/")],
                )
            else:
                self.send_response(403)
                self.end_headers()
            return
        self.send_response(404)
        self.end_headers()


@pytest.fixture(scope="module")
def site():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    srv.requests = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, srv
    srv.shutdown()


def _policy(**kw) -> FetchPolicy:
    kw.setdefault(
        "include", IncludePatterns(domain_patterns=frozenset(["127.0.0.1"]))
    )
    kw.setdefault("robots_enabled", False)
    return FetchPolicy(**kw)


def test_get_chain_and_headers(site):
    base, srv = site
    pol = _policy(basic_auth=("bob", "pw"))
    f = LiveFetcher(pol)
    fr = f.fetch(f"{base}/")
    assert fr.ok and fr.chain == [f"{base}/"]
    assert "<a href" in fr.body
    path, hdrs = srv.requests[-1]
    assert hdrs["User-Agent"] == pol.user_agent
    assert hdrs["Authorization"].startswith("Basic ")


def test_redirect_chain_reference_order(site):
    base, _ = site
    fr = LiveFetcher(_policy()).fetch(f"{base}/r")
    # landed first, originally-requested last (Fetch.hs:42)
    assert fr.ok and fr.chain == [f"{base}/target", f"{base}/r"]


def test_redirect_cap(site):
    base, _ = site
    fr = LiveFetcher(_policy(max_redirects=5)).fetch(f"{base}/loop")
    assert not fr.ok and "redirect" in fr.error.lower()


def test_declared_content_length_reject(site):
    base, _ = site
    fr = LiveFetcher(_policy()).fetch(f"{base}/big")
    assert not fr.ok and "Content-Length exceeded" in fr.error


def test_form_post_transmits_credentials(site):
    """process_url over the live transport: the form instruction's merged
    params travel as a real urlencoded POST body; the outcome stores the
    login landing and shares the server's session cookie."""
    base, _ = site
    good = _policy(
        form_instructions=parse_form_instructions(
            f"Label=l\nUrlRegex=/form\nFormActionRegex=/login\n"
            f"username={USER}\npassword={PW}\n"
        )
    )
    f = LiveFetcher(good)
    out = process_url(None, good, f"{base}/form", lambda u: False, fetch=f.fetch)
    assert out.status == "stored"
    assert COOKIE in out.shared_cookies
    assert "/secret" in out.body

    bad = _policy(
        form_instructions=parse_form_instructions(
            f"Label=l\nUrlRegex=/form\nFormActionRegex=/login\n"
            f"username={USER}\npassword=wrong\n"
        )
    )
    out2 = process_url(
        None, bad, f"{base}/form", lambda u: False, fetch=LiveFetcher(bad).fetch
    )
    assert out2.status == "failed"  # 403: credentials genuinely checked


def test_post_307_preserves_method_and_body(site):
    """ADVICE r3: http-client's getRedirectedRequest keeps the method and
    body across 307/308 (Fetch.hs:29-70) — a form POST answered by a 307
    must re-POST the credentials at the new location, while a 303 must
    downgrade to a body-less GET."""
    from crawler_ray.formlogic import FormRequest

    base, srv = site
    f = LiveFetcher(_policy())
    creds = (("username", USER), ("password", PW))

    fr = f.fetch(FormRequest("l", "post", f"{base}/relay307", creds))
    assert fr.ok, fr.error
    # landed on the login success page: the body survived the 307 hop
    assert "/secret" in fr.body
    assert COOKIE in fr.set_cookies
    assert fr.chain == [f"{base}/login", f"{base}/relay307"]
    # the re-issued request really was a POST with a body
    path, hdrs = srv.requests[-1]
    assert path == "/login" and int(hdrs.get("Content-Length", 0)) > 0

    fr3 = f.fetch(FormRequest("l", "post", f"{base}/relay303", creds))
    assert fr3.ok and fr3.chain == [f"{base}/b", f"{base}/relay303"]
    assert "leaf" in fr3.body
    path3, hdrs3 = srv.requests[-1]
    assert path3 == "/b" and "Content-Length" not in hdrs3


def _crawl_live(seeds, policy, fetcher, max_rounds=10):
    """Single-threaded round-based BFS over process_url + LiveFetcher —
    the oracle-shaped driver, live transport."""
    status: dict[str, int] = {}
    cookies: dict[str, str] = {}
    docs = []
    frontier = []
    for s in seeds:
        cu = canonicalise(s)
        if cu and policy.include.accepts(cu) and cu not in status:
            status[cu] = 1
            frontier.append(cu)
    for _ in range(max_rounds):
        if not frontier:
            break
        csnap = tuple(sorted(cookies.items()))
        nxt, shared = [], []
        for url in frontier:
            out = process_url(
                None, policy, url, lambda u: u in status,
                cookies=csnap, fetch=fetcher.fetch,
            )
            if out.status == "stored":
                status.pop(url, None)
                for u in out.completed:
                    status[u] = 2
                docs.append(out)
                shared += out.shared_cookies
                for link in out.links:
                    if policy.include.accepts(link) and link not in status:
                        status[link] = 1
                        nxt.append(link)
            elif out.status == "failed":
                status[url] = 3
        for n, v in shared:  # shareCookies at round end
            cookies[n] = v
        frontier = nxt
    return docs, status, cookies


def test_e2e_crawl_mini_site(site):
    """E2e crawl of the localhost mini-site: link discovery, redirect,
    meta-refresh, form login, and a cookie-gated page that is reachable
    ONLY because the session cookie is carried across rounds."""
    base, _ = site
    pol = _policy(
        form_instructions=parse_form_instructions(
            f"Label=l\nUrlRegex=/form\nFormActionRegex=/login\n"
            f"username={USER}\npassword={PW}\n"
        )
    )
    docs, status, cookies = _crawl_live([f"{base}/"], pol, LiveFetcher(pol))
    stored = {d.url for d in docs}
    assert stored == {
        f"{base}/", f"{base}/a", f"{base}/b", f"{base}/r",
        f"{base}/meta", f"{base}/form", f"{base}/secret",
    }
    assert cookies == {COOKIE[0]: COOKIE[1]}
    # the redirect's stored doc landed on /target with the reference chain
    rdoc = next(d for d in docs if d.url == f"{base}/r")
    assert rdoc.redirect_chain == [f"{base}/target", f"{base}/r"]
    # /target and /fresh were marked completed via chains, never re-fetched
    assert status[f"{base}/target"] == 2
    assert status[f"{base}/fresh"] == 2
