"""Config parsers: form instructions, href directions, include patterns.

Semantics from the reference:
- form instructions: /root/reference/src/Initialisation.hs:138-178 —
  blank-line-separated blocks of ``k=v`` lines; ``Label``/``UrlRegex``/
  ``FormActionRegex`` required (block silently dropped otherwise); remaining
  pairs are form params, URL-unescaped; later files/blocks merge by label.
  Example fixture format: /root/reference/eg/form_instructions.cfg:1-10.
- href directions: /root/reference/src/Directions.hs:45-67 — triples of
  ``HrefDirection=``/``UrlRegex=``/``HrefRegex=`` lines; parse error raises.
  Example: /root/reference/eg/direction_instructions.cfg:1-7.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from urllib.parse import unquote


@dataclass(frozen=True)
class FormInstruction:
    label: str
    url_regex: str
    form_action_regex: str
    params: tuple[tuple[str, str], ...]


@dataclass(frozen=True)
class HrefDirection:
    label: str
    url_regex: str
    href_regex: str


def parse_form_instructions(text: str) -> dict[str, FormInstruction]:
    """Initialisation.hs:148-178. Returns label -> instruction."""
    out: dict[str, FormInstruction] = {}
    blocks: list[list[str]] = []
    cur: list[str] = []
    for line in text.splitlines():
        if line == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(line)
    if cur:
        blocks.append(cur)
    for block in blocks:
        tuples = []
        for line in block:
            parts = line.split("=")
            if len(parts) == 2:  # exactly one '=' (splitOn semantics)
                tuples.append((parts[0], parts[1]))
        # FIRST occurrence wins (Initialisation.hs getVal = headMay;
        # review-found r5: the dict comprehension was last-wins)
        required: dict[str, str] = {}
        for k, v in tuples:
            if k in ("Label", "UrlRegex", "FormActionRegex") and k not in required:
                required[k] = v
        params = [
            (unquote(k), unquote(v))
            for k, v in tuples
            if k not in ("Label", "UrlRegex", "FormActionRegex")
        ]
        if not all(k in required for k in ("Label", "UrlRegex", "FormActionRegex")):
            continue  # chunkToInstruction -> Nothing
        out[required["Label"]] = FormInstruction(
            label=required["Label"],
            url_regex=required["UrlRegex"],
            form_action_regex=required["FormActionRegex"],
            params=tuple(params),
        )
    return out


_DIRECTION_LINE = re.compile(r"\s*(HrefDirection|UrlRegex|HrefRegex)[^=]*=\s*([^\r\n]*)")


def parse_href_directions(text: str) -> list[HrefDirection]:
    """Directions.hs:45-67: strict triple parser; malformed input raises."""
    out: list[HrefDirection] = []
    lines = [ln for ln in text.splitlines() if ln.strip()]
    i = 0
    while i < len(lines):
        triple: dict[str, str] = {}
        for expect in ("HrefDirection", "UrlRegex", "HrefRegex"):
            if i >= len(lines):
                raise ValueError("Failed href directions parsing")
            m = _DIRECTION_LINE.match(lines[i])
            if not m or m.group(1) != expect:
                raise ValueError("Failed href directions parsing")
            triple[expect] = m.group(2)
            i += 1
        out.append(
            HrefDirection(
                label=triple["HrefDirection"],
                url_regex=triple["UrlRegex"],
                href_regex=triple["HrefRegex"],
            )
        )
    return out


def load_patterns_csv(arg: str) -> frozenset[str]:
    """``-i``/``-d`` comma-separated pattern lists (Initialisation.hs:70-89)."""
    return frozenset(p for p in (s.strip() for s in arg.split(",")) if p)


def load_patterns_file(text: str) -> frozenset[str]:
    """``-if`` file: one pattern per line, trimmed, blanks dropped."""
    return frozenset(p for p in (ln.strip() for ln in text.splitlines()) if p)
