"""Wave-358: CRDT merge convergence + Merkle digests vs python."""

from __future__ import annotations

from data_ingestor_web_app_spark.io import table
from data_ingestor_web_app_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"
MOD = (1 << 61) - 1


def test_lww_crdt_convergence(spark):
    rows = table(spark, SF, "events").selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS us", "event_id"
    ).collect()
    direct = {}
    reps = {0: {}, 1: {}}
    for r in rows:
        k = r["us"] * 100000000 + r["event_id"]
        u = r["user_id"]
        if u not in direct or k > direct[u][0]:
            direct[u] = (k, r["event_type"])
        rep = reps[r["event_id"] % 2]
        if u not in rep or k > rep[u][0]:
            rep[u] = (k, r["event_type"])
    merged = {}
    for rep in reps.values():
        for u, (k, v) in rep.items():
            if u not in merged or k > merged[u][0]:
                merged[u] = (k, v)
    assert merged == direct  # the semilattice converges
    row = QUERIES["pipeline_lww_crdt_merge"](spark, SF).first()
    assert row["n_registers"] == len(direct)
    assert row["n_converged"] == len(direct)
    assert row["n_diverged"] == 0


def test_merkle_replay(spark):
    rows = table(spark, SF, "orders").selectExpr(
        "o_orderkey", "CAST(ROUND(o_totalprice*100) AS LONG) AS c"
    ).collect()
    leaves = {}
    for r in rows:
        b = r["o_orderkey"] % 32
        t = (r["o_orderkey"] * 2654435761 + r["c"]) % MOD
        leaves[b] = (leaves.get(b, 0) + t) % MOD
    level = [leaves.get(b, None) for b in range(32)]
    assert all(h is not None for h in level)  # keys cover all buckets
    while len(level) > 1:
        level = [
            (31 * level[i] % MOD + level[i + 1]) % MOD
            for i in range(0, len(level), 2)
        ]
    row = QUERIES["maintenance_merkle_tree"](spark, SF).first()
    assert row["n_leaves"] == 32 and row["depth"] == 5
    assert row["n_nonempty"] == 32
    assert row["root_digest"] == level[0]
    assert row["min_leaf_digest"] == min(leaves.values())
    assert row["max_leaf_digest"] == max(leaves.values())
    # the root is sensitive to a single-cent corruption
    leaves2 = dict(leaves)
    leaves2[0] = (leaves2[0] + 1) % MOD
    lvl2 = [leaves2[b] for b in range(32)]
    while len(lvl2) > 1:
        lvl2 = [
            (31 * lvl2[i] % MOD + lvl2[i + 1]) % MOD
            for i in range(0, len(lvl2), 2)
        ]
    assert lvl2[0] != level[0]


def test_merkle_sparse_keys_total_tree(spark, tmp_path):
    """ADVICE r8 #1: on dbgen-sparse keys (o_orderkey%32 confined to a few
    residues) the tree must still be TOTAL — empty leaves seed to digest 0
    and the root matches the zero-seeded python replay, instead of the
    combine joins collapsing to zero rows."""
    sparse_dir = str(tmp_path / "sparse")
    spark.sql(
        "SELECT CAST(id * 32 + id % 8 AS BIGINT) AS o_orderkey, "
        "CAST(100.0 + id AS DOUBLE) AS o_totalprice FROM range(200)"
    ).write.parquet(sparse_dir + "/orders.parquet")
    rows = spark.read.parquet(sparse_dir + "/orders.parquet").collect()
    leaves = {}
    for r in rows:
        b = r["o_orderkey"] % 32
        t = (r["o_orderkey"] * 2654435761 + round(r["o_totalprice"] * 100)) % MOD
        leaves[b] = (leaves.get(b, 0) + t) % MOD
    assert len(leaves) == 8  # genuinely sparse: 24 of 32 buckets empty
    level = [leaves.get(b, 0) for b in range(32)]
    while len(level) > 1:
        level = [
            (31 * level[i] % MOD + level[i + 1]) % MOD
            for i in range(0, len(level), 2)
        ]
    row = QUERIES["maintenance_merkle_tree"](spark, sparse_dir).first()
    assert row is not None and row["root_digest"] == level[0]
    assert row["n_nonempty"] == 8
    assert row["min_leaf_digest"] == min(leaves.values())
