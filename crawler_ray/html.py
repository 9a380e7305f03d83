"""Minimal tolerant HTML extraction: hrefs, meta-refresh, forms.

Regex tokenizer standing in for the reference's fast-tagsoup ``parseTags``
(/root/reference/src/Crawl.hs:120). Extraction semantics mirror:

- href extraction:    /root/reference/src/Parse.hs:47-51 — every attribute
                      named ``href`` (case-insensitive) on ``<a>`` open tags,
                      whitespace-trimmed.
- meta-refresh:       /root/reference/src/Parse.hs:22-38 — first ``<meta>``
                      with ``http-equiv="refresh"`` BEFORE ``</head>``;
                      ``content`` attr split on space/semicolon; first token
                      starting with ``url`` (case-insensitive); value after
                      ``=`` up to whitespace.
- form extraction:    /root/reference/src/Forms.hs:22-54 — sections from each
                      ``<form>`` open tag through its ``</form>``; ``action``
                      attr (default "") and ``method`` attr (default "GET")
                      from the form tag; each ``<input>`` tag's attribute
                      list kept for name/value discovery.

Documented deviations from the reference tokenizer (review r5) — both
strictly widen what is extracted and only show on live HTML, never on the
synthetic (lowercase, comment-free) corpus:

- tag names match case-INSENSITIVELY here; the reference's
  ``isTagOpenName "a"/"form"/"input"`` run on NON-canonicalized tagsoup
  tags and are case-sensitive (only ``getMeta`` canonicalizes). Chosen
  deliberately: uppercase tags are common on the live web and a crawler
  that drops ``<A HREF>`` is broken in practice.
- the regex tokenizer has no comment/script/CDATA awareness, so markup
  inside ``<!-- -->`` or ``<script>`` strings is extracted; tagsoup
  tokenizes those as comment/text nodes the reference never inspects.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TAG_RE = re.compile(r"<\s*(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*)>", re.S)
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?""", re.S
)


class Tag:
    """One parsed tag. ``attrs`` (original-case keys, unquoted values) is
    parsed lazily from the raw attribute blob on first access — most tags'
    attributes are never inspected (only a/meta/form/input are), and the
    attribute regex was ~60% of tokenizer CPU in the crawl hot path."""

    __slots__ = ("close", "name", "_blob", "_attrs")

    def __init__(self, close: bool, name: str, blob: str = "", attrs=None):
        self.close = close
        self.name = name
        self._blob = blob
        self._attrs = attrs

    @property
    def attrs(self) -> list[tuple[str, str]]:
        a = self._attrs
        if a is None:
            a = []
            if not self.close and self._blob:
                for am in _ATTR_RE.finditer(self._blob):
                    k = am.group(1)
                    v = am.group(2) or ""
                    if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
                        v = v[1:-1]
                    a.append((k, v))
            self._attrs = a
        return a

    def __repr__(self) -> str:  # debugging / test-failure readability
        return f"Tag(close={self.close}, name={self.name!r}, attrs={self.attrs!r})"

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Tag)
            and self.close == other.close
            and self.name == other.name
            and self.attrs == other.attrs
        )


def parse_tags(html: str) -> list[Tag]:
    tags: list[Tag] = []
    for m in _TAG_RE.finditer(html):
        tags.append(Tag(bool(m.group(1)), m.group(2).lower(), m.group(3)))
    return tags


def get_raw_hrefs(tags: list[Tag]) -> list[str]:
    """All ``href`` attribute values (case-insensitive key) on ``<a>`` open
    tags, trimmed (Parse.hs:47-51)."""
    out: list[str] = []
    for t in tags:
        if not t.close and t.name == "a":
            for k, v in t.attrs:
                if k.lower() == "href":
                    out.append(v.strip())
    return out


def find_meta_refresh(tags: list[Tag]) -> str | None:
    """Raw (pre-derelativise) meta-refresh target, or None (Parse.hs:22-38)."""
    for t in tags:
        if t.close and t.name == "head":
            break
        if t.close or t.name != "meta":
            continue
        lowered = {(k.lower(), v.lower()) for k, v in t.attrs}
        if ("http-equiv", "refresh") not in lowered:
            continue
        content = ""
        for k, v in t.attrs:
            if k.lower() == "content":
                content = v
                break
        for token in re.split(r"[ ;]", content):
            if token.lower().startswith("url"):
                _, _, after = token.partition("=")
                url = after.split()[0] if after.split() else after
                return url
        return None
    return None


@dataclass
class Form:
    """Parsed form: page anchor is supplied by the caller (Forms.hs:27)."""

    action: str  # raw relative url, default "" (Forms.hs:31-33)
    method: str  # default "GET" (Forms.hs:36-38)
    inputs: list[list[tuple[str, str]]]  # one attr list per <input>


def _blob_attrs(blob: str) -> list[tuple[str, str]]:
    a: list[tuple[str, str]] = []
    if blob:
        for am in _ATTR_RE.finditer(blob):
            v = am.group(2) or ""
            if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
                v = v[1:-1]
            a.append((am.group(1), v))
    return a


def scan_page(
    html: str, want_forms: bool = True
) -> tuple[list[str], str | None, list["Form"]]:
    """Single-pass fused extractor: ``(raw hrefs, meta-refresh target,
    forms)`` with semantics IDENTICAL to ``get_raw_hrefs(parse_tags(h))``
    / ``find_meta_refresh(parse_tags(h))`` / ``get_forms(parse_tags(h))``
    (equivalence asserted over generated + malformed pages in
    tests/test_html_configs.py). The crawl hot path calls this instead of
    materializing a Tag list and walking it three times — only a/meta/
    form/input open tags ever allocate. ``want_forms=False`` (no form
    instructions configured) skips form bookkeeping entirely."""
    hrefs: list[str] = []
    meta: str | None = None
    meta_done = False
    forms: list[Form] = []
    active: list[Form] = []
    for m in _TAG_RE.finditer(html):
        name = m.group(2).lower()
        if m.group(1):
            if name == "head":
                meta_done = True
            elif want_forms and name == "form":
                active.clear()
            continue
        if name == "a":
            blob = m.group(3)
            if blob:
                for am in _ATTR_RE.finditer(blob):
                    if am.group(1).lower() == "href":
                        v = am.group(2) or ""
                        if len(v) >= 2 and v[0] in "\"'" and v[-1] == v[0]:
                            v = v[1:-1]
                        hrefs.append(v.strip())
        elif name == "meta" and not meta_done:
            attrs = _blob_attrs(m.group(3))
            if ("http-equiv", "refresh") in {
                (k.lower(), v.lower()) for k, v in attrs
            }:
                content = ""
                for k, v in attrs:
                    if k.lower() == "content":
                        content = v
                        break
                for token in re.split(r"[ ;]", content):
                    if token.lower().startswith("url"):
                        _, _, after = token.partition("=")
                        meta = after.split()[0] if after.split() else after
                        break
                meta_done = True  # first refresh meta decides (Parse.hs:22-38)
        elif want_forms and name == "form":
            attrs = _blob_attrs(m.group(3))
            # FIRST occurrence of each attribute wins unconditionally
            # (Forms.hs:31-38 takes the head of the filtered list; the
            # old ''/'GET' sentinels let a duplicate attribute override an
            # explicit first value — review-found r5)
            action: str | None = None
            method: str | None = None
            for k, v in attrs:
                kl = k.lower()
                if kl == "action" and action is None:
                    action = v
                elif kl == "method" and method is None:
                    method = v
            f = Form(
                action=action if action is not None else "",
                method=method if method is not None else "GET",
                inputs=[],
            )
            forms.append(f)
            active.append(f)
        elif want_forms and name == "input" and active:
            attrs = _blob_attrs(m.group(3))
            # the first </form> after any open form closes ALL active forms
            # (Forms.hs sections semantics), so every active form sees this
            # input; give each its own list object like get_forms does
            for f in active:
                f.inputs.append(list(attrs))
    return hrefs, meta, forms


def get_forms(tags: list[Tag]) -> list[Form]:
    """Forms per Forms.hs:22-54 (takeWhilePlus1 through ``</form>``)."""
    forms: list[Form] = []
    i = 0
    n = len(tags)
    while i < n:
        t = tags[i]
        if not t.close and t.name == "form":
            action: str | None = None
            method: str | None = None
            for k, v in t.attrs:
                if k.lower() == "action" and action is None:
                    action = v
                elif k.lower() == "method" and method is None:
                    method = v
            action = action if action is not None else ""
            method = method if method is not None else "GET"
            inputs: list[list[tuple[str, str]]] = []
            j = i + 1
            while j < n and not (tags[j].close and tags[j].name == "form"):
                tj = tags[j]
                if not tj.close and tj.name == "input":
                    inputs.append(list(tj.attrs))
                j += 1
            forms.append(Form(action=action, method=method, inputs=inputs))
            # Reference's ``sections`` restarts at every <form> open tag, so
            # nested forms each produce a record; advance one tag only.
        i += 1
    return forms
