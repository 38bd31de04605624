#!/usr/bin/env bash
# Two-decades-up board (VERDICT r16 #1): replay the full declared-query
# registry at sf1 and produce ONE self-contained artifact.
#
#   1. graft.Verify sharded over NVERIFY parallel JVMs (round-robin by
#      sorted query name; pid-scoped scratch dirs make this safe since
#      r16), each from a SNAPSHOTTED classpath so the sbt edit loop
#      stays free;
#   2. a final no-op Verify pass rewrites oracle_sql.json alone (the
#      parallel workers each wrote it; one serial rewrite removes any
#      torn-write doubt);
#   3. tools/check_json.py sharded over NCHECK DuckDB workers;
#   4. tools/merge_board.py merges the shards and, for timed-out
#      oracles with an exact Spark-side reference, invokes
#      graft.tools.DecadeGraphCheck (inverted-index exact mode at this
#      scale) and stamps the verdict INTO the artifact.
#
# Usage: tools/board_sf1.sh [sfDir] [outDir] [artifact]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/tmp/sf1}"
OUT="${2:-/tmp/verify_sf1}"
ART="${3:-CORRECTNESS_SF1.json}"
NVERIFY="${NVERIFY:-3}"
NCHECK="${NCHECK:-5}"
VCPUS="${VCPUS:-10}"
T0=$(date +%s)

mkdir -p "$OUT"
python3 - "$NVERIFY" <<'EOF' > /tmp/board_shards.txt
import json, sys
names = sorted(json.load(open('CORRECTNESS_r16.json')))
names = [n for n in names if n != '_meta']
n = int(sys.argv[1])
for i in range(n):
    print(' '.join(names[i::n]))
EOF

echo "== verify phase: $NVERIFY workers x local[$VCPUS] =="
i=0
pids=()
while IFS= read -r shard; do
  GRAFT_SNAPSHOT=1 SPARK_GRAFT_CPUS="$VCPUS" tools/run_main.sh \
    graft.Verify "$SF" "$OUT" $shard \
    > "/tmp/board_verify_$i.log" 2>&1 &
  pids+=($!)
  i=$((i+1))
done < /tmp/board_shards.txt
rc=0
for p in "${pids[@]}"; do wait "$p" || rc=$?; done
echo "verify workers done rc=$rc ($(( $(date +%s) - T0 ))s)"
# serial oracle_sql.json rewrite (filter matches nothing -> no dumps)
GRAFT_SNAPSHOT=1 SPARK_GRAFT_CPUS=2 tools/run_main.sh \
  graft.Verify "$SF" "$OUT" __oracle_only__ \
  > /tmp/board_verify_oracle.log 2>&1

echo "== check phase: $NCHECK DuckDB workers =="
pids=()
for s in $(seq 0 $((NCHECK-1))); do
  CHECK_THREADS="${CHECK_THREADS:-5}" \
  CHECK_ORACLE_TIMEOUT_SEC="${CHECK_ORACLE_TIMEOUT_SEC:-900}" \
  python3 tools/check_json.py "$SF" "$OUT" "/tmp/board_shard_$s.json" \
    "$s" "$NCHECK" > "/tmp/board_check_$s.log" 2>&1 &
  pids+=($!)
done
for p in "${pids[@]}"; do wait "$p" || true; done
echo "check workers done ($(( $(date +%s) - T0 ))s)"

echo "== merge + alt-oracle phase =="
SHARDS=$(ls /tmp/board_shard_*.json)
GRAFT_SNAPSHOT=1 SPARK_GRAFT_EXACT_MODE=inverted \
  python3 tools/merge_board.py "$ART" "$SF" $SHARDS || true
echo "board total $(( $(date +%s) - T0 ))s -> $ART"
