"""Regenerate BENCH_BASELINE.json with per-pin provenance (VERDICT r10 item 4).

Every pin must be REPRODUCIBLE from committed evidence. The certified
sources are exactly the git-history versions of ``BENCH_LATEST.json``
whose ``n_reps`` >= MIN_REPS — the builder's certification runs, which
record rep count and box load. The driver's per-round ``BENCH_r*.json``
artifacts are deliberately NOT pin sources: they carry no rep count and
no load context (the r9 incident artifact was a 3-rep run started at
loadavg 9.57 — and, in the other direction, the r04/r05 numbers predate
the per-query process-isolation methodology and sit 1.4-2.3x BELOW what
any controlled run achieves, so min-ing them in would fabricate
unreachable pins). Same qualification rule as tests/test_bench_guard.py:
below MIN_REPS, an artifact is not evidence.

pin(query) = min over certified sources of that query's median. Each pin
carries {source, sec, n_reps, loadavg_1m, def_sha}: which artifact attains
it, under what load, and a hash of the query's CURRENT implementation
source so a rework after pinning is visible (tests/test_bench_baseline.py
recomputes all of this and fails on any drift, making the ratchet
auditable instead of archaeological).

The pinned QUERY SET is the existing baseline's (the 60-query headline
contract); this tool refreshes values/provenance, it does not grow the set.

Usage: python tools/pin_baseline.py [--write]
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
MIN_REPS = 5  # keep in lockstep with tests/test_bench_guard.py


def certified_sources() -> dict[str, dict]:
    """source-id -> {queries: {name: sec}, n_reps, loadavg_1m}."""
    out: dict[str, dict] = {}
    shas = subprocess.run(
        ["git", "log", "--format=%h", "--", "BENCH_LATEST.json"],
        cwd=ROOT,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.split()
    for sha in shas:
        blob = subprocess.run(
            ["git", "show", f"{sha}:BENCH_LATEST.json"],
            cwd=ROOT,
            capture_output=True,
            text=True,
        )
        if blob.returncode != 0:
            continue
        try:
            d = json.loads(blob.stdout)
        except json.JSONDecodeError:
            continue
        if d.get("n_reps", 0) < MIN_REPS or "median" not in d:
            continue
        out[f"BENCH_LATEST@{sha}"] = {
            "queries": d["median"],
            "n_reps": d["n_reps"],
            "loadavg_1m": (d.get("load_start") or {}).get("loadavg_1m"),
        }
    return out


def def_sha(name: str) -> str | None:
    sys.path.insert(0, str(ROOT))
    from data_ingestor_web_app_spark import registry

    registry.load_all()
    fn = registry.QUERIES.get(name)
    if fn is None:
        return None
    src = inspect.getsource(fn)
    return hashlib.sha256(src.encode()).hexdigest()[:12]


def build_baseline() -> dict:
    current = json.loads((ROOT / "BENCH_BASELINE.json").read_text())
    names = sorted(current["queries"])
    sources = certified_sources()
    queries: dict[str, float] = {}
    provenance: dict[str, dict] = {}
    missing = []
    for name in names:
        best = None
        for sid, src in sources.items():
            sec = src["queries"].get(name)
            if sec is None:
                continue
            if best is None or sec < best[0]:
                best = (float(sec), sid, src)
        if best is None:
            missing.append(name)
            continue
        sec, sid, src = best
        queries[name] = round(sec, 3)
        provenance[name] = {
            "source": sid,
            "n_reps": src["n_reps"],
            "loadavg_1m": src["loadavg_1m"],
            "def_sha": def_sha(name),
        }
    return {
        "note": (
            "per-query best certified median; REGENERATED artifact — every "
            "pin is the minimum of that query's recorded seconds across the "
            "committed driver rounds (BENCH_r*.json parsed.queries) and the "
            f"builder certification runs (git-history BENCH_LATEST.json with "
            f"n_reps >= {MIN_REPS}); regenerate with tools/pin_baseline.py, "
            "verified by tests/test_bench_baseline.py"
        ),
        "source": "tools/pin_baseline.py (committed certified artifacts only)",
        "queries": queries,
        "provenance": provenance,
        "unpinnable": missing,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    new = build_baseline()
    old = json.loads((ROOT / "BENCH_BASELINE.json").read_text())["queries"]
    for name, sec in new["queries"].items():
        o = old.get(name)
        if o is not None and abs(o - sec) > 1e-9:
            d = "LOOSENED" if sec > o else "tightened"
            print(
                f"{d} {name}: {o} -> {sec} ({new['provenance'][name]['source']})"
            )
    if new["unpinnable"]:
        print("UNPINNABLE (no certified artifact records them):", new["unpinnable"])
    if args.write:
        (ROOT / "BENCH_BASELINE.json").write_text(json.dumps(new, indent=1, sort_keys=True))
        print(f"wrote BENCH_BASELINE.json: {len(new['queries'])} pins")


if __name__ == "__main__":
    main()
