"""Form selection/merge and href-direction matching.

Semantics from the reference:
- selectFormOptions / mergeSuppliedAndDiscoveredFormActions:
  /root/reference/src/Forms.hs:56-104 — first form (document order) whose
  page URL matches an instruction's UrlRegex AND whose derelativised action
  URL matches its FormActionRegex; discovered inputs (``name``/``value``
  attrs, value defaults empty) are overridden by supplied params; overriding
  a key that was not discovered is an error (Forms.hs:83-90).
- findDirection: /root/reference/src/Directions.hs:20-43 — first direction
  whose UrlRegex matches the current URL and whose HrefRegex's FIRST capture
  group matches the raw page body; derelativised; non-derelativisable
  candidates are skipped.

Instruction matching uses ``re.search`` (Haskell ``=~`` is unanchored).
Instructions iterate in sorted-label order (Haskell ``Map`` = sorted map,
Forms.hs:100-104).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .configs import FormInstruction, HrefDirection
from .html import Form
from .urlkit import derelativise


@dataclass(frozen=True)
class FormRequest:
    label: str
    method: str
    target_url: str
    params: tuple[tuple[str, str], ...]


def discover_form_parameter(attrs: list[tuple[str, str]]) -> tuple[str, str] | None:
    """First ``name`` attr and first ``value`` attr (default ""), Forms.hs:92-97."""
    name = None
    value = None
    for k, v in attrs:
        if k.lower() == "name" and name is None:
            name = v
        elif k.lower() == "value" and value is None:
            value = v
    if name is None:
        return None
    return (name, value if value is not None else "")


def merge_form_actions(
    instructions: dict[str, FormInstruction],
    form_location: str,
    form_target_url: str,
    discovered: list[tuple[str, str]],
) -> tuple[str, tuple[tuple[str, str], ...]] | None:
    """Forms.hs:69-104. Returns (label, merged params) or None."""
    applicable = None
    for label in sorted(instructions):
        ins = instructions[label]
        if re.search(ins.url_regex, form_location) and re.search(
            ins.form_action_regex, form_target_url
        ):
            applicable = ins
            break
    if applicable is None:
        return None
    merged = dict(discovered)
    for k, v in applicable.params:
        if k not in merged:
            raise ValueError(f"Trying to override non-existing key: {k!r}")
        merged[k] = v
    # Haskell Map.toList emits sorted key order (Forms.hs:78).
    return (applicable.label, tuple(sorted(merged.items())))


def select_form_options(
    instructions: dict[str, FormInstruction],
    form_location: str,
    forms: list[Form],
) -> FormRequest | None:
    """Forms.hs:56-67: first form with an applicable instruction wins.

    Laziness fidelity (ADVICE r1): the reference's per-form formTargetUrl
    ``error`` thunk is only forced when some instruction's UrlRegex already
    matched the page, so with no URL-matching instruction a bad form action
    returns Nothing instead of erroring. Mirror by pre-filtering on
    url_regex (it only depends on form_location) before derelativising.
    """
    if not instructions:
        return None
    if not any(
        re.search(ins.url_regex, form_location) for ins in instructions.values()
    ):
        return None
    for form in forms:
        kind, target = derelativise(form_location, form.action)
        if kind != "url":
            raise ValueError(f"Could not derelativise form action: {form.action!r}")
        discovered = []
        for attrs in form.inputs:
            kv = discover_form_parameter(attrs)
            if kv is not None:
                discovered.append(kv)
        merged = merge_form_actions(instructions, form_location, target, discovered)
        if merged is not None:
            label, params = merged
            return FormRequest(label=label, method=form.method, target_url=target, params=params)
    return None


def find_direction(
    directions: list[HrefDirection], url: str, body: str
) -> str | None:
    """Directions.hs:20-43: first matching direction's resolved target."""
    for d in directions:
        if not re.search(d.url_regex, url):
            continue
        m = re.search(d.href_regex, body)
        # reference: candidate = FIRST declared group of the first match
        # (Directions.hs:39 ``headMay . concatMap (drop 1)``); a regex
        # with no groups yields Nothing, and regex-posix returns '' for a
        # declared-but-non-participating group — group(1) may be None in
        # Python for the same case (alternation where a later group
        # matched), which previously crashed with AttributeError
        # (review-found r5)
        if not m or m.re.groups < 1:
            continue
        kind, resolved = derelativise(url, m.group(1) or "")
        if kind == "url":
            return resolved
    return None
