"""Unit vectors for urlkit per FIXTURES.md F6 / reference Urls.hs."""

from crawler_ray.urlkit import (
    IncludePatterns,
    canonicalise,
    derelativise,
    get_domain,
    url_hash,
)


def test_canonicalise_port_strip():
    # Urls.hs:25-31: :80 stripped for http, :443 for https, others kept
    assert canonicalise("http://example.com:80/a") == "http://example.com/a"
    assert canonicalise("https://example.com:443/a") == "https://example.com/a"
    assert canonicalise("http://example.com:443/a") == "http://example.com:443/a"
    assert canonicalise("https://example.com:80/a") == "https://example.com:80/a"
    assert canonicalise("http://example.com:8080/a") == "http://example.com:8080/a"


def test_canonicalise_case_normalize():
    assert canonicalise("HTTP://EXAMPLE.com/Path") == "http://example.com/Path"


def test_canonicalise_escape_normalize():
    # unreserved escapes decoded, reserved escapes uppercased
    assert canonicalise("http://x.test/%7e%41b") == "http://x.test/~Ab"
    assert canonicalise("http://x.test/a%2fb") == "http://x.test/a%2Fb"


def test_canonicalise_path_segments():
    assert canonicalise("http://x.test/a/b/../c/./d") == "http://x.test/a/c/d"
    assert canonicalise("http://x.test/../a") == "http://x.test/a"


def test_canonicalise_fragment_drop():
    # Urls.hs:45-47 (discardFragments=True, Settings.hs:24-25)
    assert canonicalise("http://x.test/a#frag") == "http://x.test/a"
    assert canonicalise("http://x.test/a?q=1#frag") == "http://x.test/a?q=1"


def test_canonicalise_rejects_non_absolute():
    assert canonicalise("/relative/only") is None
    assert canonicalise("") is None
    assert canonicalise("mailto:foo@bar.test") is None
    assert canonicalise("nonsense") is None


def test_derelativise_absolute():
    kind, v = derelativise("http://x.test/a", "HTTP://Y.test/b#z")
    assert (kind, v) == ("url", "http://y.test/b")


def test_derelativise_mailto_warning():
    # Urls.hs:74
    kind, v = derelativise("http://x.test/a", "mailto:foo@bar.test")
    assert kind == "warning"
    assert "Found an email" in v


def test_derelativise_relative_join():
    assert derelativise("http://x.test/dir/page", "../up") == ("url", "http://x.test/up")
    assert derelativise("http://x.test/dir/page", "sib") == ("url", "http://x.test/dir/sib")
    assert derelativise("http://x.test/dir/page", "/root") == ("url", "http://x.test/root")


def test_derelativise_space_encoding():
    # Urls.hs:90-91
    kind, v = derelativise("http://x.test/a/", "some page.html")
    assert (kind, v) == ("url", "http://x.test/a/some%20page.html")


def test_derelativise_fragment_only():
    # fragment dropped -> empty relative -> resolves to the base itself
    kind, v = derelativise("http://x.test/a", "#top")
    assert (kind, v) == ("url", "http://x.test/a")


def test_get_domain():
    # Urls.hs:100-103
    assert get_domain("http://example.com/a/b") == "example.com"
    assert get_domain("http://example.com") == "example.com"
    assert get_domain("http://example.com:8080/a") == "example.com:8080"
    assert get_domain("no-scheme-here") is None


def test_url_hash_stable():
    assert url_hash("http://x.test/a") == url_hash("http://x.test/a")
    assert url_hash("http://x.test/a") != url_hash("http://x.test/b")
    assert 0 <= url_hash("http://x.test/a") < 2**64


def test_include_patterns():
    # Crawl.hs:214-228: infix OR-semantics over both sets; empty sets reject
    empty = IncludePatterns()
    assert not empty.accepts("http://x.test/a")
    p = IncludePatterns(url_patterns=frozenset(["/allowed/"]))
    assert p.accepts("http://x.test/allowed/a")
    assert not p.accepts("http://x.test/other")
    d = IncludePatterns(domain_patterns=frozenset(["x.test"]))
    assert d.accepts("http://sub.x.test/anything")
    assert not d.accepts("http://y.test/x.test")  # domain only, not path


def test_canonical_fast_path_equals_full_path():
    """The already-canonical detector may only ever return what the full
    normalization would: compare both paths over synthetic-web hrefs plus
    adversarial vectors (the fast path is bypassed by neutering its
    regex)."""
    import re

    from crawler_ray import urlkit
    from crawler_ray.html import get_raw_hrefs, parse_tags
    from crawler_ray.webgen import WebSpec

    spec = WebSpec(500, 20, 42)
    urls = []
    for i in range(200):
        urls.append(spec.url_of(i))
        body = spec.render_page(i, spec.caption_of(i))
        for raw in get_raw_hrefs(parse_tags(body)):
            urls.append(raw)
            urls.append("http://host0.test/" + raw.lstrip("/"))
    urls += [
        "HTTP://Host3.TEST:80/page/7", "http://h.test/a/../b",
        "http://h.test/%7Euser", "http://h.test/%41bc", "http://h.test",
        "http://h.test/", "http://h.test/p?q=1&r=2", "http://h.test/p#frag",
        "https://h.test:443/x", "http://h.test/a/./b", "http://h.test/a b",
        "mailto:x@y.z", "not a url", "", "http://", "ftp://h.test/x",
        "http://h.test/trailing.", "http://UPPER.test/p",
        "http://h.test/page/1?x=%20y",
        # query directly after the host (no path): authority lowercasing
        # must stop at '?' — hypothesis-found regression (round 3)
        "http://A?A", "http://H.test?Q=V", "http://H.test:80?Q",
        "HTTP://h.test?q", "http://h.test?",
        # dot hosts: the /./ collapse must never cross the authority —
        # hypothesis-found regression (round 4, VERDICT r4 #1)
        "http://./0", "http://../a", "http://./", "http://.",
        "http://./././x", "HTTP://./0", "http://h.test:80/./x",
        "http://.:80/./x", "http://./?q=/./",
    ]
    never = re.compile(r"(?!x)x")  # matches nothing
    orig = urlkit._ALREADY_CANONICAL
    try:
        for u in urls:
            fast = urlkit.canonicalise(u)
            urlkit._ALREADY_CANONICAL = never
            full = urlkit.canonicalise(u)
            urlkit._ALREADY_CANONICAL = orig
            assert fast == full, (u, fast, full)
    finally:
        urlkit._ALREADY_CANONICAL = orig


def test_canonical_fast_path_fuzz():
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_ray import urlkit

    never = re.compile(r"(?!x)x")
    orig = urlkit._ALREADY_CANONICAL

    @settings(max_examples=400, deadline=None)
    @given(st.text(alphabet="abzAZ019:/.%#?&=~_- \t", max_size=48))
    def check(s):
        for u in (s, "http://" + s, "http://h.test/" + s, "https://H.te/" + s):
            fast = urlkit.canonicalise(u)
            urlkit._ALREADY_CANONICAL = never
            full = urlkit.canonicalise(u)
            urlkit._ALREADY_CANONICAL = orig
            assert fast == full, (u, fast, full)

    try:
        check()
    finally:
        urlkit._ALREADY_CANONICAL = orig


def test_derelativise_root_relative_query_only_base():
    """Explicit regression (review-found r5): a root-relative ref on a
    query-only base must replace the query, not be appended into it."""
    assert derelativise("http://h.test?q=v", "/x") == ("url", "http://h.test/x")
    # the REF's query is stripped too (parseRelative stripQueryParams —
    # non-absolute refs lose their query before resolution)
    assert derelativise("https://x.test:8080?a=1", "/p?b=2") == (
        "url",
        "https://x.test:8080/p",
    )


def test_derelativise_relative_query_stripped():
    """Urls.hs:56-70 stripQueryParams: non-absolute refs lose their query
    (2 segments), keep the FIRST of two queries ('a?b?c' -> a?b via the
    fragment path), and pass 4+ segments through unchanged; absolute
    refs keep their query."""
    base = "http://h.test/dir/page"
    assert derelativise(base, "other?x=1") == ("url", "http://h.test/dir/other")
    assert derelativise(base, "/x?q=1") == ("url", "http://h.test/x")
    assert derelativise(base, "a?b?c") == ("url", "http://h.test/dir/a?b")
    assert derelativise(base, "a?b?c?d") == (
        "url",
        "http://h.test/dir/a?b?c?d",
    )
    assert derelativise(base, "http://o.test/p?q=1") == (
        "url",
        "http://o.test/p?q=1",
    )


def test_derelativise_root_relative_fast_path_fuzz():
    """The root-relative concat shortcut (RFC 3986 §5.3 merge for refs
    starting with a single '/') must agree with the general urljoin path —
    the same fast-vs-full fixpoint discipline that caught the r4
    canonicalise bug."""
    from urllib.parse import urljoin

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from crawler_ray.urlkit import canonicalise, derelativise

    bases = st.sampled_from(
        [
            "http://h.test/a/b", "http://h.test", "http://h.test/",
            "https://x.y.test:8080/deep/path?q=1", "http://h.test/a/b/c/",
            "HTTP://UP.test:80/A", "http://h.test/p?q=v",
            # query-WITHOUT-path bases: the authority end is '?' not '/'
            # (review-found r5: the fast path smuggled the ref into the
            # base's query for these)
            "http://h.test?q=v", "https://x.test:8080?a=1&b=2",
        ]
    )

    @settings(max_examples=400, deadline=None)
    @given(bases, st.text(alphabet="abzAZ019:/.%#?&=~_- \t", max_size=32))
    def check(base, tail):
        raw = "/" + tail.lstrip("/")  # single leading slash (fast path)
        if raw.startswith("//"):
            return
        got = derelativise(base, raw)
        # ground truth: sanitize like derelativise (strip, remove
        # tab/CR/LF like urlsplit does, drop fragment, encode spaces),
        # then general urljoin
        s = raw
        for ch in "\t\r\n":
            s = s.replace(ch, "")
        h = s.find("#")
        if h != -1:
            s = s[:h]
        s = s.replace(" ", "%20")
        # parseRelative stripQueryParams (Urls.hs:56-70): non-absolute
        # refs lose their query (1 '?'), keep the first of two, pass 3+
        nq = s.count("?")
        if nq == 1:
            s = s[: s.index("?")]
        elif nq == 2:
            a_, b_, _ = s.split("?")
            s = a_ + "?" + b_
        cbase = canonicalise(base)
        joined = canonicalise(urljoin(cbase, s))
        if joined is None:
            assert got[0] == "error", (base, raw, got)
        else:
            assert got == ("url", joined), (base, raw, got, joined)

    check()
