"""Configurable scratch root for harness artifacts (VERDICT r10 item 7).

Replay chunks, sentinel files, checkpoints, and sink targets must never be
written next to ``sf_dir`` (which may be a read-only mount or an object
store) — everything flows through io.scratch_dir, which honors
SPARK_GRAFT_SCRATCH.
"""

from __future__ import annotations

import pathlib

from data_ingestor_web_app_spark.io import scratch_dir
from data_ingestor_web_app_spark.streaming import runtime


def test_scratch_dir_honors_env_root(tmp_path, monkeypatch):
    root = tmp_path / "custom_scratch"
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(root))
    d = scratch_dir("probe_")
    assert pathlib.Path(d).parent == root
    assert pathlib.Path(d).name.startswith("probe_")


def test_scratch_dir_defaults_to_tmp(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH", raising=False)
    d = scratch_dir("probe_")
    assert pathlib.Path(d).exists()


def test_replay_author_writes_under_scratch_root(spark, sf_small, tmp_path, monkeypatch):
    root = tmp_path / "replay_scratch"
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH", str(root))
    # n_files=3 is unused elsewhere, so memoization can't serve a dir
    # created before the env override
    out = runtime.write_replay_files(spark, sf_small, 3)
    assert pathlib.Path(out).parent == root
    parts = sorted(p.name for p in pathlib.Path(out).iterdir())
    assert len(parts) == 3 and all(p.endswith(".parquet") for p in parts)
    # never under the fixture dir
    assert not out.startswith(sf_small)
