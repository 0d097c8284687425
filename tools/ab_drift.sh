#!/bin/bash
# Interleaved A/B drift attribution (VERDICT r7 item 3: ingest_1m_records
# 0.689s r6 -> 0.925s r7). Alternates fresh-JVM bench invocations between
# HEAD (/root/repo) and the r6-pinned worktree so box noise hits both sides
# equally; medians over n pairs separate real plan drift from contention.
#
# Usage: bash tools/ab_drift.sh [n_pairs] [worktree] [query ...]
set -u
N="${1:-7}"
WT="${2:-/tmp/ab_r6}"
shift 2 2>/dev/null || true
QUERIES=("${@:-agg_groupby}")
OUT="/tmp/ab_drift_$(date +%s).jsonl"
echo "writing $OUT"
for i in $(seq 1 "$N"); do
  # alternate order within each pair to cancel first-mover cache effects
  if (( i % 2 == 1 )); then SIDES=("/root/repo" "$WT"); else SIDES=("$WT" "/root/repo"); fi
  for side in "${SIDES[@]}"; do
    python /root/repo/tools/ab_bench.py "$side" "${QUERIES[@]}" >> "$OUT" 2>/dev/null
  done
done
python - "$OUT" <<'EOF'
import json, statistics, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {}
for r in rows:
    for q, t in r["times"].items():
        by.setdefault((r["repo"], q), []).append(t)
    by.setdefault((r["repo"], "ingest_rps"), []).append(r["ingest_rps"])
for (repo, q), ts in sorted(by.items()):
    print(f"{repo:12s} {q:24s} n={len(ts)} median={statistics.median(ts):.3f} min={min(ts):.3f} max={max(ts):.3f}")
EOF
