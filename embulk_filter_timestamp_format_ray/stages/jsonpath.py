"""Restricted JSONPath dialect → nested-field steps.

Reference: /root/reference/src/main/java/org/embulk/filter/timestamp_format/
JsonPathUtil.java:33-77 (rejects scan ``..``, functions, predicates, slices,
multi-index) and README.md:66-82 (dot, bracket, single index, ``[*]``
wildcard).  In the Ray engine nested data is Arrow struct/list columns, so a
path compiles to steps over struct fields and list elements:

    $.record.nested.nested[0].timestamp
        → [(field record) (field nested) (field nested) (index 0) (field timestamp)]

``parse_json_path`` is also used on JSON-string payloads (dynamic documents)
by the scalar fallback in stages/timestamp_format.py.
"""

from __future__ import annotations

import re

from typing import Union

Step = Union[tuple]  # ("field", name) | ("index", int) | ("wildcard", None)

_TOKEN_RE = re.compile(
    r"""
    \.\.                                  # scan — rejected
  | \.(?P<dot>[A-Za-z_][A-Za-z0-9_\- ]*) # .name
  | \[\s*'(?P<sq>[^']*)'\s*\]            # ['name']
  | \[\s*"(?P<dq>[^"]*)"\s*\]            # ["name"]
  | \[\s*(?P<idx>-?\d+)\s*\]             # [0]
  | \[\s*\*\s*\]                         # [*]
  | \[(?P<other>[^\]]*)\]                # anything else — rejected
    """,
    re.VERBOSE,
)


class JsonPathError(ValueError):
    pass


def parse_json_path(path: str) -> "list[Step]":
    if not path.startswith("$"):
        raise JsonPathError(f"jsonpath {path!r} must start with $")
    steps: list[Step] = []
    pos = 1
    while pos < len(path):
        m = _TOKEN_RE.match(path, pos)
        if m is None:
            raise JsonPathError(f"jsonpath {path!r}: cannot parse at offset {pos}")
        if m.group(0) == "..":
            raise JsonPathError(f'scan path token is not supported "{path}"')
        if m.group("dot") is not None:
            name = m.group("dot")
            if "(" in path[pos:]:
                # function tokens like $.length() — reject the whole path
                rest = path[m.end():]
                if rest.startswith("("):
                    raise JsonPathError(f'function path token is not supported "{path}"')
            steps.append(("field", name))
        elif m.group("sq") is not None:
            steps.append(("field", m.group("sq")))
        elif m.group("dq") is not None:
            steps.append(("field", m.group("dq")))
        elif m.group("idx") is not None:
            steps.append(("index", int(m.group("idx"))))
        elif "*" in m.group(0):
            steps.append(("wildcard", None))
        else:
            other = m.group("other") or ""
            if other.startswith("?"):
                raise JsonPathError(f'predicate path token is not supported "{path}"')
            if ":" in other:
                raise JsonPathError(f'Array Slice Operation is not supported "{path}"')
            if "," in other:
                raise JsonPathError(f'Multi Array Indexes is not supported "{path}"')
            raise JsonPathError(f"jsonpath {path!r}: unsupported token [{other}]")
        pos = m.end()
    if not steps:
        raise JsonPathError(f"jsonpath {path!r} has no steps")
    return steps


def canonical(path: str) -> str:
    """Canonical spelling so dot and bracket notation unify
    (PathCompiler.toString analog: $['a']['b'][0])."""
    out = ["$"]
    for kind, val in parse_json_path(path):
        if kind == "field":
            out.append(f"['{val}']")
        elif kind == "index":
            out.append(f"[{val}]")
        else:
            out.append("[*]")
    return "".join(out)
