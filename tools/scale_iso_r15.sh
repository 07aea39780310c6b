#!/bin/bash
# r15 isolated-session scale program (same protocol as r14: one
# spark-submit JVM per (gate, SF), first-run timing, /tmp cleaned between
# sessions; fit from isolated single-gate sessions only — see
# SCALE_overrides_r13.json for why within-session numbers contaminate).
set -u
JAR=target/scala-2.13/datafusionrandgenspark_2.13-0.1.0.jar
OUT=target/scale_r15_iso
mkdir -p "$OUT"
GATES="$1"
SFS="${2:-sf0.1:/root/testdata/sf0.1 sf1:target/sf1 sf3:target/sf3 sf10:target/sf10}"
for sf in $SFS; do
  name="${sf%%:*}"; dir="${sf#*:}"
  for g in $GATES; do
    find /tmp -maxdepth 1 -name 'graft_*' -exec rm -rf {} + 2>/dev/null
    SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_ONLY="$g" \
    SPARK_GRAFT_BENCH_RUNS=1 \
    /opt/spark/bin/spark-submit --class graft.Bench --master 'local[32]' \
      --driver-memory 64g "$JAR" 2>/dev/null | grep '"metric"' \
      > "$OUT/${g}_${name}.json"
    echo "done $g $name: $(python3 -c "import json;d=json.load(open('$OUT/${g}_${name}.json'));print(d['queries'], 'calib', d['calib_s'], d['calib_end_s'])" 2>/dev/null || echo FAILED)"
  done
done
