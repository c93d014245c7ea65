#!/bin/bash
# Full-registry correctness sweep at a large scale factor, as N parallel
# driver_sim processes over interleaved name chunks in SEPARATE cwds
# (isolated spark-warehouses: certificate tables use fixed names), each
# with a bounded Spark driver heap and a capped DuckDB thread pool --
# the r9/r10 recipe (ROUND_NOTES "Round-9 stint 3", verify skill
# "Round-9 additions").
#
# Usage: tools/sweep_parallel.sh <sf_dir> <out_prefix> [n_chunks]
# Example:
#   tools/sweep_parallel.sh /root/repo/.scaledata/sf1.0 /tmp/sim_sf1 4
# Merges the chunk JSONs into ${out_prefix}_merged.json on success.
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SF_DIR="$1"
OUT_PREFIX="$2"
N=${3:-4}

NAMES=$(python3 - <<EOF
import sys
sys.path.insert(0, "$REPO")
import __spark_entry__ as e
print("\n".join(sorted(e.queries())))
EOF
)

pids=()
for i in $(seq 0 $((N - 1))); do
  CHUNK=$(echo "$NAMES" | awk -v i="$i" -v n="$N" 'NR % n == i')
  WORK="${OUT_PREFIX}_cwd$i"
  mkdir -p "$WORK"
  (
    cd "$WORK" &&
    PYTHONPATH="$REPO" \
    SPARK_GRAFT_SIM_DRIVER_MEM=12g \
    SPARK_GRAFT_SIM_CPUS=8 \
    SPARK_GRAFT_SIM_MAX_PARTITION_BYTES=8m \
    SPARK_GRAFT_SIM_DUCKDB_THREADS=8 \
    python "$REPO/tools/driver_sim.py" "$SF_DIR" \
      --json "${OUT_PREFIX}_chunk$i.json" $CHUNK \
      > "${OUT_PREFIX}_chunk$i.log" 2>&1
  ) &
  pids+=($!)
done

rc=0
for p in "${pids[@]}"; do
  wait "$p" || rc=1
done

python3 - <<EOF
import json
merged = {}
# NB: \$i would be expanded by the SHELL inside this unquoted heredoc
# (to the stale outer loop variable); build the chunk paths in python.
for i in range($N):
    with open("${OUT_PREFIX}_chunk" + str(i) + ".json") as f:
        merged.update(json.load(f))
with open("${OUT_PREFIX}_merged.json", "w") as f:
    json.dump(merged, f, indent=1, sort_keys=True)
bad = [k for k, v in merged.items()
       if not (v.get("rows_match") and v.get("schema_match")
               and v.get("hash_match") is not False and not v.get("err"))
       and "skipped" not in v]
print(f"merged {len(merged)} entries -> ${OUT_PREFIX}_merged.json; "
      f"failures: {bad if bad else 'none'}")
EOF
exit $rc
