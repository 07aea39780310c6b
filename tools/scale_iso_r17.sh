#!/bin/bash
# r16 isolated-session scale program (r15 protocol: one spark-submit JVM
# per (gate, SF), /tmp cleaned between sessions, calib probes gating).
# r17 change: SPARK_GRAFT_REPO_ROOT points the detail files at the iso
# scratch root so iso runs never mutate the committed bench/ directory
# (the r16 ADVICE item).
# Usage: scale_iso_r17.sh "<gates>" ["name:dir name:dir ..."] [runs] [heap]
set -u
JAR=target/scala-2.13/datafusionrandgenspark_2.13-0.1.0.jar
OUT=target/scale_r17_iso
mkdir -p "$OUT"
GATES="$1"
SFS="${2:-sf0.1:/root/testdata/sf0.1 sf1:target/sf1 sf3:target/sf3 sf10:target/sf10}"
RUNS="${3:-1}"
HEAP="${4:-64g}"
for sf in $SFS; do
  name="${sf%%:*}"; dir="${sf#*:}"
  for g in $GATES; do
    find /tmp -maxdepth 1 -name 'graft_*' -exec rm -rf {} + 2>/dev/null
    tag="iso_${g}_${name}_${HEAP}"
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ONLY="$g" \
    SPARK_GRAFT_BENCH_RUNS="$RUNS" SPARK_GRAFT_BENCH_TAG="$tag" \
    SPARK_GRAFT_REPO_ROOT="$OUT/root" \
    /opt/spark/bin/spark-submit --class graft.Bench --master 'local[32]' \
      --driver-memory "$HEAP" "$JAR" 2>/dev/null | grep '"metric"' \
      > "$OUT/${g}_${name}_${HEAP}.json"
    cp "$OUT/root/bench/bench_full_${tag}.json" "$OUT/${g}_${name}_${HEAP}_detail.json" 2>/dev/null
    echo "done $g $name $HEAP: $(python3 -c "
import json
d=json.load(open('$OUT/${g}_${name}_${HEAP}_detail.json'))
print(d['runs'], 'calib', d['calib_s'], d['calib_end_s'])" 2>/dev/null || echo FAILED)"
  done
done
