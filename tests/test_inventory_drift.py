"""Drift guards for the generated review artifacts (r5 VERDICT item 8):
OPERATORS.md must equal what tools/dump_inventory.py would write today,
and PLANS.md's query rows must cover exactly the live batch registry —
a stale table now FAILS here instead of silently rotting (r5 shipped an
OPERATORS.md claiming 602 queries while the registry held 649)."""

from __future__ import annotations

import importlib.util
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_tool(name: str):
    spec = importlib.util.spec_from_file_location(name, REPO / "tools" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_operators_md_matches_registry():
    inv = _load_tool("dump_inventory")
    committed = (REPO / "OPERATORS.md").read_text()
    expected = inv.render()
    assert committed == expected, (
        "OPERATORS.md is stale — regenerate with `python tools/dump_inventory.py`"
    )


def test_plans_md_covers_live_registry():
    from data_ingestor_web_app_spark import registry

    registry.load_all()
    plans = _load_tool("dump_plans")
    expected = set(registry.QUERIES) - plans.SKIP
    committed = {
        m.group(1)
        for m in re.finditer(r"^\| (\w+) \|", (REPO / "PLANS.md").read_text(), re.M)
        if m.group(1) != "query"
    }
    missing = expected - committed
    extra = committed - expected
    assert not missing and not extra, (
        f"PLANS.md is stale (missing={sorted(missing)[:5]}..., "
        f"extra={sorted(extra)[:5]}...) — regenerate with "
        "`python tools/dump_plans.py`"
    )
