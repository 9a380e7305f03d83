"""Unit tests: HTML extraction (M4-M8), config parsers (S5-S6), form merge
(M9), direction match (M10) — vectors hand-derived from the cited reference
code (see module docstrings)."""

import pytest

from crawler_ray.configs import (
    parse_form_instructions,
    parse_href_directions,
    load_patterns_csv,
)
from crawler_ray.formlogic import find_direction, select_form_options
from crawler_ray.html import find_meta_refresh, get_forms, get_raw_hrefs, parse_tags


def test_href_extraction_case_insensitive_and_trim():
    tags = parse_tags(
        '<A HREF=" /a ">x</A><a class="z" href="/b" href="/c"><p href="/no">'
    )
    assert get_raw_hrefs(tags) == ["/a", "/b", "/c"]


def test_href_unquoted_and_single_quoted():
    tags = parse_tags("<a href=/u>u</a><a href='/s'>s</a>")
    assert get_raw_hrefs(tags) == ["/u", "/s"]


def test_meta_refresh_inside_head_only():
    html = (
        "<html><head><meta http-equiv='refresh' content='5; URL=/next'></head>"
        "<body><meta http-equiv='refresh' content='0; url=/ignored'></body>"
    )
    assert find_meta_refresh(parse_tags(html)) == "/next"
    after_head = (
        "<html><head></head><body>"
        "<meta http-equiv='refresh' content='0; url=/late'></body>"
    )
    assert find_meta_refresh(parse_tags(after_head)) is None


def test_meta_refresh_case_insensitive_equiv():
    html = '<head><META HTTP-EQUIV="Refresh" CONTENT="0;url=http://y.test/"></head>'
    assert find_meta_refresh(parse_tags(html)) == "http://y.test/"


def test_meta_refresh_absent():
    assert find_meta_refresh(parse_tags("<head><meta charset='utf8'></head>")) is None


def test_get_forms_defaults_and_inputs():
    html = (
        "<form><input name='a' value='1'></form>"
        "<form action='/go' method='post'>"
        "<input name='user'><input value='orphan'><input name='pw' value=''>"
        "</form>"
    )
    forms = get_forms(parse_tags(html))
    assert len(forms) == 2
    assert forms[0].action == "" and forms[0].method == "GET"
    assert forms[1].action == "/go" and forms[1].method == "post"
    assert len(forms[1].inputs) == 3


def test_parse_form_instructions_reference_fixture():
    # format per /root/reference/eg/form_instructions.cfg:1-10
    text = (
        "Label=login\n"
        "UrlRegex=http://127.0.0.1:3000/login/\n"
        "FormActionRegex=http://127.0.0.1:3000/submitLogin\n"
        "username=admin\n"
        "password=admin%20x\n"
        "\n"
        "Label=confirm\n"
        "UrlRegex=http://127.0.0.1:3000/confirm/\n"
        "FormActionRegex=http://127.0.0.1:3000/submitConfirm\n"
        "accept=true\n"
    )
    ins = parse_form_instructions(text)
    assert set(ins) == {"login", "confirm"}
    assert ins["login"].params == (("username", "admin"), ("password", "admin x"))


def test_parse_form_instructions_missing_required_dropped():
    text = "Label=x\nUrlRegex=y\nsomekey=v\n"
    assert parse_form_instructions(text) == {}


def test_parse_href_directions():
    text = (
        "HrefDirection=sample1\n"
        "UrlRegex=127.0.0.1:3000\n"
        'HrefRegex=<a href="(0)">\n'
    )
    [d] = parse_href_directions(text)
    assert d.label == "sample1"
    assert d.href_regex == '<a href="(0)">'


def test_parse_href_directions_malformed_raises():
    # eg/direction_instructions.cfg:5 has the 'refDirection' typo; the
    # reference's attoparsec parser fails on it (Directions.hs:50)
    with pytest.raises(ValueError):
        parse_href_directions("refDirection=bad\nUrlRegex=x\nHrefRegex=(y)\n")


def test_select_form_options_merge_and_override_error():
    ins = parse_form_instructions(
        "Label=login\nUrlRegex=login\nFormActionRegex=submit\nuser=admin\n"
    )
    forms = get_forms(
        parse_tags("<form action='/submit' method='post'><input name='user' value='guest'>"
                   "<input name='token' value='t1'></form>")
    )
    fr = select_form_options(ins, "http://x.test/login/", forms)
    assert fr is not None
    assert fr.target_url == "http://x.test/submit"
    assert fr.method == "post"
    assert dict(fr.params) == {"user": "admin", "token": "t1"}

    # Forms.hs:83-90: overriding a non-discovered key errors
    bad = parse_form_instructions(
        "Label=login\nUrlRegex=login\nFormActionRegex=submit\nmissing=v\n"
    )
    with pytest.raises(ValueError, match="non-existing key"):
        select_form_options(bad, "http://x.test/login/", forms)


def test_select_form_options_no_match():
    ins = parse_form_instructions(
        "Label=login\nUrlRegex=elsewhere\nFormActionRegex=submit\n"
    )
    forms = get_forms(parse_tags("<form action='/submit'></form>"))
    assert select_form_options(ins, "http://x.test/login/", forms) is None


def test_find_direction_first_capture_group():
    dirs = parse_href_directions(
        "HrefDirection=next\nUrlRegex=x\\.test\nHrefRegex=<a href=\"(/page/[0-9]+)\" rel=next>\n"
    )
    body = '<a href="/page/7" rel=next>'
    assert find_direction(dirs, "http://x.test/p", body) == "http://x.test/page/7"
    assert find_direction(dirs, "http://other.test/p", body) is None
    assert find_direction(dirs, "http://x.test/p", "<a href='/nope'>") is None


def test_load_patterns_csv():
    assert load_patterns_csv("a, b,,c") == frozenset({"a", "b", "c"})


# --- scan_page: fused hot-path extractor must equal the 3-walk composition


_SCAN_CASES = [
    "",
    "<html><body>no tags of interest</body></html>",
    '<a href=" /sp ">x</a><A HREF=/caps>y</A><a>none</a>',
    "<a href=/u href2=/v href=/w>double-href</a>",
    "<head><meta http-equiv=refresh content='5; url=/next'></head><a href=/z>z</a>",
    "<head><meta http-equiv=refresh content='5'></head>"
    "<head><meta http-equiv=refresh content='0; url=/late'></head>",
    "</head><meta http-equiv=refresh content='0; url=/afterhead'>",
    "<head><meta http-equiv=refresh content='0; URL='></head>",
    "<form action=/a method=post><input name=a value=1>"
    "<form action=/b><input name=b></form><input name=c></form>",
    "<form><input name=only></form><form action=/second method=PUT></form>",
    "<input name=orphan><form action=/x><input name=x>",
    "<meta http-equiv=refresh content='0;url=/x' ><a href='/q'>q</a>"
    "<form action='/f'><input type=text name=n value='v w'></form>",
    "<a href=http://e.test/>e</a><p <a href=/broken></p>",
]


def test_scan_page_equals_composition():
    from crawler_ray.html import scan_page

    for html in _SCAN_CASES:
        tags = parse_tags(html)
        want = (get_raw_hrefs(tags), find_meta_refresh(tags), get_forms(tags))
        assert scan_page(html) == want, html
        # forms-off mode: hrefs/meta identical, forms empty
        hrefs, meta, forms = scan_page(html, want_forms=False)
        assert (hrefs, meta) == want[:2] and forms == [], html


def test_scan_page_equals_composition_on_rendered_pages():
    from crawler_ray.html import scan_page
    from crawler_ray.webgen import WebSpec

    spec = WebSpec(n_pages=4000, n_hosts=160, seed=11)
    for i in range(0, 4000, 7):
        html = spec.render_page(i, spec.caption_of(i))
        tags = parse_tags(html)
        want = (get_raw_hrefs(tags), find_meta_refresh(tags), get_forms(tags))
        assert scan_page(html) == want, i


def test_find_direction_nonparticipating_group():
    """Review-found r5: alternation where a LATER group matches left
    group(1) as None and crashed with AttributeError. The reference takes
    the first declared group even when empty (regex-posix returns '' for
    non-participating groups), resolving '' to the base URL."""
    from crawler_ray.configs import HrefDirection
    from crawler_ray.formlogic import find_direction

    d = HrefDirection(
        label="L",
        url_regex=r".*",
        href_regex=r'href="(/a[^"]*)"|onclick=\'(go[^\']*)\'',
    )
    # only the SECOND alternative matches -> group(1) is None -> '' ->
    # resolves to the base URL (no crash)
    got = find_direction([d], "http://h.test/p", "x onclick='go2' y")
    assert got == "http://h.test/p"
    # a regex with no groups at all never fires (headMay [] = Nothing)
    d0 = HrefDirection(label="L", url_regex=r".*", href_regex=r"plain")
    assert find_direction([d0], "http://h.test/p", "plain text") is None


def test_form_instruction_duplicate_keys_first_wins():
    """Initialisation.hs getVal = headMay: the FIRST UrlRegex/Label line
    in a block wins (review-found r5: dict comprehension was last-wins)."""
    from crawler_ray.configs import parse_form_instructions

    text = (
        "Label=login\n"
        "UrlRegex=first\n"
        "FormActionRegex=act\n"
        "UrlRegex=second\n"
        "user=alice\n"
    )
    out = parse_form_instructions(text)
    assert out["login"].url_regex == "first"


def test_form_duplicate_attrs_first_wins():
    """Forms.hs:31-38 takes the head of the filtered attr list: the first
    action/method attribute wins even if an explicit later duplicate
    exists (review-found r5: ''/'GET' sentinels let duplicates override)."""
    from crawler_ray.html import scan_page

    html = '<form method="GET" action="" method="post" action="/x"></form>'
    _, _, forms = scan_page(html, want_forms=True)
    assert len(forms) == 1
    assert forms[0].method == "GET"
    assert forms[0].action == ""
