"""Per-query bench regression guard.

Compares a QUALIFYING local bench run against the committed baseline
(BENCH_BASELINE.json = per-query best across driver rounds, ALL 59 headline
queries since r9). Skips cleanly when no qualifying bench run exists.

MIN-OF-REPS + DRIFT NORMALIZATION (r9): four consecutive rounds of
interleaved A/B (r6 ingest, r7 ingest, r8 ingest, r9 sim_mmd_poly —
BENCH_SCALE.md) pinned every outsized round-over-round move on box
contention, which inflates ALL queries by a common factor (1.13x-1.48x
median observed). The guard flags a query only when its ratio exceeds
REGRESSION_FACTOR x the MEDIAN ratio across all pinned queries (floored at
1.0): uniform drift cancels, while a single query regressing against its
peers — the plan-regression signature — fails loudly.

ARTIFACT QUALIFICATION (r10, VERDICT r9 item 1): BENCH_LATEST.json is
dual-use — the builder's certification artifact AND the driver's
post-commit scratch output. In r9 the driver clobbered a committed 5-rep
clean-box artifact with a 3-rep run started at loadavg-1m 9.57, and
min-of-3-reps never got a clean scheduling slot (agg_ks_test reps
[0.894, 0.856, 0.847] vs a 0.586 min on the clean run) — the guard went
red with zero code change. min-of-reps only converges to "can the plan
still go this fast" with enough reps; below MIN_REPS the artifact is not
evidence. The guard therefore prefers the working-tree artifact only when
it has >= MIN_REPS reps, falls back to the committed HEAD artifact
(`git show HEAD:BENCH_LATEST.json`) otherwise, and skips with an
instruction to re-bench when neither qualifies.

ABSOLUTE CEILING (r10, ADVICE r9): drift normalization alone would let a
genuinely uniform code regression (e.g. in shared io.table) hide as "box
contention". If the median ratio itself exceeds DRIFT_CEILING while the
recorded load context says the box was idle (loadavg_1m at bench start
below IDLE_LOAD_FRACTION x cpus), contention is excluded and the uniform
slowdown is attributed to the code — fail.
"""

from __future__ import annotations

import json
import statistics
import subprocess
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent
REGRESSION_FACTOR = 1.5
# absolute floor: sub-0.5s queries are scheduler-noise-bound at sf0.1 —
# a 0.2s -> 0.35s move is not a regression signal
MIN_BASELINE_SEC = 0.5
# min-of-reps needs this many samples to converge under ambient load
MIN_REPS = 5
# uniform-slowdown ceiling: median drift above this on an idle box is code
DRIFT_CEILING = 2.5
# "idle box" = loadavg_1m at bench start under this fraction of cpu count
IDLE_LOAD_FRACTION = 0.2
# A query listed in BENCH_ATTRIBUTIONS.json with verdict "environment"
# (an interleaved A/B showing HEAD ~= a pinned past checkout on the same
# box) is exempt from the relative band — but NEVER beyond this hard cap
# vs its pin, so a stale attribution cannot mask a later real regression.
ATTRIBUTION_CAP = 2.0
# Attribution expiry (r11, ADVICE r10): an "environment" verdict is evidence
# about ONE box state. Each entry must carry the round its A/B ran in; it
# exempts for that round plus the next (the grace round covers the
# round-boundary where DRIVER_ROUND has been bumped but the box state is
# unchanged), after which the entry is stale: it no longer exempts, and
# test_no_stale_attributions fails until the A/B is re-run (refreshing the
# round stamp) or the entry is deleted — the same stale-allow discipline as
# the eager lint's ALLOWED list.
ATTRIBUTION_GRACE_ROUNDS = 1


def _current_round() -> int:
    from data_ingestor_web_app_spark.registry import DRIVER_ROUND

    return int(DRIVER_ROUND.lstrip("r"))


def _attribution_live(entry: dict, current_round: int | None = None) -> bool:
    cur = _current_round() if current_round is None else current_round
    return entry.get("round", -(10**9)) >= cur - ATTRIBUTION_GRACE_ROUNDS


def attributions() -> dict:
    p = ROOT / "BENCH_ATTRIBUTIONS.json"
    if not p.exists():
        return {}
    try:
        return json.loads(p.read_text())
    except json.JSONDecodeError:
        return {}


def check_bench(detail: dict, baseline: dict[str, float]) -> list[str]:
    """Pure guard core: return a list of human-readable violations
    (empty = green). ``detail`` is a bench.py artifact dict; ``baseline``
    maps query name -> pinned best-median seconds."""
    latest = detail["min"]
    ratios = {
        name: latest[name] / base_sec
        for name, base_sec in baseline.items()
        if name in latest and base_sec >= MIN_BASELINE_SEC
    }
    if not ratios:
        return ["no comparable queries between bench artifact and baseline"]
    drift = max(1.0, statistics.median(ratios.values()))
    band = REGRESSION_FACTOR * drift
    load = {k: detail.get(k) for k in ("load_start", "load_end") if detail.get(k)}
    attr = attributions()
    violations = [
        f"{name}: {baseline[name]:.2f}s -> {latest[name]:.2f}s "
        f"({r:.2f}x vs {drift:.2f}x median drift; band {band:.2f}x) "
        f"bench-run box load: {json.dumps(load)}"
        for name, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if r > band
        and not (
            attr.get(name, {}).get("verdict") == "environment"
            and _attribution_live(attr.get(name, {}))
            and r <= ATTRIBUTION_CAP * drift
        )
    ]
    # absolute ceiling: uniform regression can't hide behind normalization
    # when the recorded load context excludes contention
    start = detail.get("load_start") or {}
    la1 = start.get("loadavg_1m")
    cpus = start.get("cpus") or 32
    idle = la1 is not None and la1 < IDLE_LOAD_FRACTION * cpus
    if drift > DRIFT_CEILING and idle:
        violations.append(
            f"UNIFORM regression: median drift {drift:.2f}x > "
            f"{DRIFT_CEILING}x ceiling on an idle box "
            f"(loadavg_1m {la1} on {cpus} cpus) — shared-path code "
            f"slowdown, not contention"
        )
    return violations


def qualifying_artifact() -> tuple[dict, str] | None:
    """Pick the bench artifact the guard should trust: the working-tree
    BENCH_LATEST.json when it has >= MIN_REPS reps, else the committed
    HEAD version (the builder's certification run), else None."""
    latest_p = ROOT / "BENCH_LATEST.json"
    if latest_p.exists():
        detail = json.loads(latest_p.read_text())
        if detail.get("n_reps", 0) >= MIN_REPS:
            return detail, "working-tree BENCH_LATEST.json"
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:BENCH_LATEST.json"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        detail = json.loads(blob)
        if detail.get("n_reps", 0) >= MIN_REPS:
            return detail, "committed HEAD:BENCH_LATEST.json"
    except (subprocess.CalledProcessError, json.JSONDecodeError, OSError):
        pass
    return None


def _low_rep_working_tree_note(baseline: dict[str, float]) -> str:
    """When the guard falls back past a sub-MIN_REPS working-tree artifact,
    still LOOK at that fresh run (ADVICE r10): a low-rep run is not
    *evidence* of a regression, but a visible one in it must not be
    invisible. Returns a short report of its worst ratios (or '')."""
    latest_p = ROOT / "BENCH_LATEST.json"
    if not latest_p.exists():
        return ""
    try:
        detail = json.loads(latest_p.read_text())
    except json.JSONDecodeError:
        return ""
    if detail.get("n_reps", 0) >= MIN_REPS or "min" not in detail:
        return ""
    fresh = check_bench(detail, baseline)
    if not fresh:
        return ""
    return (
        f"\nNOTE: the DISCARDED {detail.get('n_reps')}-rep working-tree "
        f"BENCH_LATEST.json would flag:\n  " + "\n  ".join(fresh)
        + f"\nre-bench with SPARK_GRAFT_BENCH_REPS={MIN_REPS} to confirm or clear."
    )


def test_no_per_query_bench_regression():
    picked = qualifying_artifact()
    baseline = json.loads((ROOT / "BENCH_BASELINE.json").read_text())["queries"]
    if picked is None:
        pytest.skip(
            f"no bench artifact with n_reps >= {MIN_REPS} (working tree or "
            f"HEAD) — re-run: SPARK_GRAFT_BENCH_REPS={MIN_REPS} python bench.py"
            + _low_rep_working_tree_note(baseline)
        )
    detail, source = picked
    violations = check_bench(detail, baseline)
    note = "" if source.startswith("working-tree") else _low_rep_working_tree_note(baseline)
    if note:
        import warnings

        warnings.warn(note, stacklevel=1)
    assert not violations, (
        f"bench regressions vs BENCH_BASELINE.json (artifact: {source}):\n"
        + "\n".join(violations)
        + note
    )


def test_no_stale_attributions():
    """Every BENCH_ATTRIBUTIONS.json entry must be round-stamped and still
    within its grace window — the stale-allow discipline of the eager lint
    applied to bench exemptions (ADVICE r10)."""
    cur = _current_round()
    stale = {
        name: entry.get("round")
        for name, entry in attributions().items()
        if not _attribution_live(entry, cur)
    }
    assert not stale, (
        f"stale bench attributions (current round r{cur}, grace "
        f"{ATTRIBUTION_GRACE_ROUNDS}): {stale} — re-run tools/ab_bench.py and "
        "refresh the round stamp, or delete the entry"
    )


# ---------------------------------------------------------------------------
# fixture tests: the r9 failure scenario and the regressions the guard must
# still catch, simulated without running a bench
# ---------------------------------------------------------------------------

_BASE = {"q_slow": 2.0, "q_mid": 1.0, "q_fast": 0.6, "q_tiny": 0.2}


def _detail(mins: dict[str, float], n_reps: int = 5, la1: float = 0.5) -> dict:
    return {
        "n_reps": n_reps,
        "min": mins,
        "load_start": {"loadavg_1m": la1, "cpus": 32},
        "load_end": {"loadavg_1m": la1, "cpus": 32},
    }


def test_guard_green_on_clean_match():
    d = _detail({"q_slow": 2.1, "q_mid": 0.95, "q_fast": 0.62, "q_tiny": 0.5})
    assert check_bench(d, _BASE) == []


def test_guard_catches_single_query_regression():
    # one query 3x its pin while peers hold: the plan-regression signature
    d = _detail({"q_slow": 6.0, "q_mid": 1.0, "q_fast": 0.6, "q_tiny": 0.2})
    out = check_bench(d, _BASE)
    assert len(out) == 1 and out[0].startswith("q_slow:")


def test_guard_ignores_uniform_contention_drift():
    # everything 1.4x under load: contention, not code — must stay green
    d = _detail(
        {"q_slow": 2.8, "q_mid": 1.4, "q_fast": 0.84, "q_tiny": 0.28},
        la1=9.5,
    )
    assert check_bench(d, _BASE) == []


def test_guard_catches_uniform_regression_on_idle_box():
    # everything 3x with loadavg 0.3 on 32 cpus: shared-path code slowdown
    d = _detail(
        {"q_slow": 6.0, "q_mid": 3.0, "q_fast": 1.8, "q_tiny": 0.6},
        la1=0.3,
    )
    out = check_bench(d, _BASE)
    assert any("UNIFORM regression" in v for v in out)


def test_guard_allows_uniform_drift_under_load():
    # same 3x uniform but loadavg 12: ceiling suppressed, contention plausible
    d = _detail(
        {"q_slow": 6.0, "q_mid": 3.0, "q_fast": 1.8, "q_tiny": 0.6},
        la1=12.0,
    )
    assert check_bench(d, _BASE) == []


def test_attributed_environment_query_within_cap_is_exempt(monkeypatch):
    import tests.test_bench_guard as g

    monkeypatch.setattr(
        g,
        "attributions",
        lambda: {"q_slow": {"verdict": "environment", "round": _current_round()}},
    )
    # 1.6x its pin while peers hold — over the 1.5x band, under the 2x cap
    d = _detail({"q_slow": 3.2, "q_mid": 1.0, "q_fast": 0.6, "q_tiny": 0.2})
    assert check_bench(d, _BASE) == []


def test_attributed_query_beyond_cap_still_fails(monkeypatch):
    import tests.test_bench_guard as g

    monkeypatch.setattr(
        g,
        "attributions",
        lambda: {"q_slow": {"verdict": "environment", "round": _current_round()}},
    )
    # 3x its pin: even a live attribution must not mask a real regression
    d = _detail({"q_slow": 6.0, "q_mid": 1.0, "q_fast": 0.6, "q_tiny": 0.2})
    out = check_bench(d, _BASE)
    assert len(out) == 1 and out[0].startswith("q_slow:")


def test_expired_attribution_no_longer_exempts(monkeypatch):
    """An attribution older than the grace window loses its exemption: the
    same 1.6x-vs-pin move that a live entry clears must flag again
    (ADVICE r10: environment verdicts must not mask regressions forever)."""
    import tests.test_bench_guard as g

    old_round = _current_round() - ATTRIBUTION_GRACE_ROUNDS - 1
    monkeypatch.setattr(
        g,
        "attributions",
        lambda: {"q_slow": {"verdict": "environment", "round": old_round}},
    )
    d = _detail({"q_slow": 3.2, "q_mid": 1.0, "q_fast": 0.6, "q_tiny": 0.2})
    out = check_bench(d, _BASE)
    assert len(out) == 1 and out[0].startswith("q_slow:")


def test_unstamped_attribution_treated_as_stale(monkeypatch):
    # a legacy entry with no round stamp must never exempt
    import tests.test_bench_guard as g

    monkeypatch.setattr(
        g, "attributions", lambda: {"q_slow": {"verdict": "environment"}}
    )
    d = _detail({"q_slow": 3.2, "q_mid": 1.0, "q_fast": 0.6, "q_tiny": 0.2})
    out = check_bench(d, _BASE)
    assert len(out) == 1 and out[0].startswith("q_slow:")


def test_artifact_qualification_rejects_short_rep_clobber(tmp_path, monkeypatch):
    """The exact r9 incident: driver clobbers the committed 5-rep artifact
    with a 3-rep loaded run. The guard must NOT read the clobber; with a
    5-rep committed artifact available it falls back to that, and with no
    qualifying artifact anywhere it reports None (-> pytest.skip)."""
    import tests.test_bench_guard as g

    repo = tmp_path
    clobber = _detail({"q_slow": 3.2}, n_reps=3, la1=9.57)
    (repo / "BENCH_LATEST.json").write_text(json.dumps(clobber))
    monkeypatch.setattr(g, "ROOT", repo)

    # no git repo at tmp_path -> committed fallback unavailable -> None
    assert g.qualifying_artifact() is None

    # a qualifying working-tree artifact is picked directly
    good = _detail({"q_slow": 2.1}, n_reps=5, la1=0.5)
    (repo / "BENCH_LATEST.json").write_text(json.dumps(good))
    picked = g.qualifying_artifact()
    assert picked is not None
    detail, source = picked
    assert detail["n_reps"] == 5 and source == "working-tree BENCH_LATEST.json"


def test_artifact_qualification_falls_back_to_committed(tmp_path, monkeypatch):
    """With a real git repo whose HEAD holds a 5-rep artifact and a 3-rep
    clobber in the working tree, the guard reads HEAD's version."""
    import tests.test_bench_guard as g

    repo = tmp_path
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
         "-q", "--allow-empty", "-m", "seed"],
        cwd=repo,
        check=True,
    )
    good = _detail({"q_slow": 2.1}, n_reps=5, la1=0.5)
    (repo / "BENCH_LATEST.json").write_text(json.dumps(good))
    subprocess.run(["git", "add", "BENCH_LATEST.json"], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t", "commit",
         "-q", "-m", "bench"],
        cwd=repo,
        check=True,
    )
    clobber = _detail({"q_slow": 3.2}, n_reps=3, la1=9.57)
    (repo / "BENCH_LATEST.json").write_text(json.dumps(clobber))
    monkeypatch.setattr(g, "ROOT", repo)
    picked = g.qualifying_artifact()
    assert picked is not None
    detail, source = picked
    assert detail["n_reps"] == 5 and source == "committed HEAD:BENCH_LATEST.json"
