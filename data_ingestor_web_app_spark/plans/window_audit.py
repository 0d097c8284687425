"""Unpartitioned-window plan audit (VERDICT r7 item 4).

204 ``Window.orderBy`` sites in the registry run without ``partitionBy``.
Each is individually justified ("Scale shape" docstrings: the window input
is an aggregated / distinct / limited frame whose cardinality is bounded by
a calendar, a dimension, or an explicit top-k), but nothing *enforced* that
the justification stays true as queries evolve.  This module parses the
optimized logical plan and flags any unpartitioned Window whose subtree
reaches an unbounded leaf (a parquet ``Relation`` / ``LogicalRDD``) without
passing through an ``Aggregate`` / ``Deduplicate`` / ``GlobalLimit`` — i.e.
a global sort over raw corpus rows, the shape that becomes a single
corpus-sized partition at 100 TB.

``tests/test_window_guard.py`` walks every registered batch query through
``audit_plan`` and fails on any unexplained global window (same enforcement
pattern as ``tests/test_output_types_guard.py``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# Leaves that are literal / generated / single-row — bounded by construction.
_BOUNDED_LEAVES = ("LocalRelation", "OneRowRelation", "Range")
# Leaves that scale with the corpus — need a reducing ancestor.
_UNBOUNDED_LEAVES = ("Relation", "LogicalRDD", "ExternalRDD")
# Ancestors that bound the cardinality flowing up from an unbounded leaf.
_REDUCERS = ("Aggregate", "Deduplicate", "GlobalLimit")

_NODE_RE = re.compile(r"^[\s:+\-]*([A-Za-z][A-Za-z0-9]*)")


@dataclass
class GlobalWindow:
    """One unpartitioned Window whose subtree hits a raw-scan leaf with no
    Aggregate/Deduplicate/GlobalLimit between the window and the leaf."""

    window_line: str
    leaf_line: str


def _top_level_groups(s: str) -> list[str]:
    """Split the argument list of a plan node into top-level [...] groups."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(s):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start >= 0:
                groups.append(s[start : i + 1])
                start = -1
    return groups


def _parse(tree: str) -> list[tuple[int, str, str]]:
    """treeString -> [(indent_pos, node_name, full_line)] skipping non-node
    continuation lines."""
    out: list[tuple[int, str, str]] = []
    for line in tree.splitlines():
        m = _NODE_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        pos = m.start(1)
        out.append((pos, name, line))
    return out


def audit_plan(tree: str) -> list[GlobalWindow]:
    """Return every unpartitioned-Window-over-raw-scan violation in the
    optimized logical plan ``tree`` (empty list = plan is scale-safe under
    the global-window rule)."""
    nodes = _parse(tree)
    violations: list[GlobalWindow] = []
    for i, (pos, name, line) in enumerate(nodes):
        if name != "Window":
            continue
        groups = _top_level_groups(line)
        # Window [exprs], [partSpec], [orderSpec] = partitioned (3 groups);
        # Window [exprs], [partSpec]              = partitioned, unordered;
        # Window [exprs], [orderSpec]             = GLOBAL ordered window;
        # Window [exprs]                          = GLOBAL unordered window
        #                                           (count(*) over ()).
        # Order specs always carry ASC/DESC; partition specs never do.
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[1]):
            continue  # partition spec without order — partitioned window
        # Walk the window's subtree; track the reducing-ancestor stack.
        stack: list[tuple[int, str]] = []  # (pos, name) of reducers below win
        for jpos, jname, jline in nodes[i + 1 :]:
            if jpos <= pos:
                break  # dedent — left the window's subtree
            while stack and stack[-1][0] >= jpos:
                stack.pop()
            if any(jname.startswith(r) for r in _REDUCERS):
                stack.append((jpos, jname))
                continue
            if any(jname.startswith(leaf) for leaf in _UNBOUNDED_LEAVES) and not any(
                jname.startswith(b) for b in _BOUNDED_LEAVES
            ):
                if not stack:
                    violations.append(
                        GlobalWindow(window_line=line.strip(), leaf_line=jline.strip())
                    )
                    break  # one violation per window is enough to report
    return violations
