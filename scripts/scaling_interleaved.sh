#!/bin/bash
# Interleaved N-vs-4N scaling measurement (verdict r4 "Next round" #1):
# alternate fresh-JVM single-mode ScalingBench legs within ONE session so
# both rungs sample the same box-noise phase; >=3 reps per rung; report
# min and median throughput per rung, the efficiency computed from
# medians, and task-core-seconds per leg. Usage:
#   scripts/scaling_interleaved.sh [N] [domains] [reps] [outfile]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-2}"; DOMAINS="${2:-500000}"; REPS="${3:-3}"
OUT="${4:-/tmp/scaling_interleaved.jsonl}"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | paste -sd:)"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JVM="-Xmx20g -Xms20g -XX:+AlwaysPreTouch -XX:+UseParallelGC -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC"
: > "$OUT"
for rep in $(seq 1 "$REPS"); do
  for cores in "$N" "$((4 * N))"; do
    echo "[leg] rep=$rep cores=$cores" >&2
    java $JVM $OPENS -cp "$CP" graft.ScalingBench "$cores" "$DOMAINS" single \
      | tail -1 >> "$OUT"
  done
done
python3 - "$OUT" "$N" <<'EOF'
import json, statistics, sys
legs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
n = int(sys.argv[2])
by = {}
for l in legs:
    by.setdefault(l["cores"], []).append(l)
for cores in sorted(by):
    thr = [x["domains_per_sec"] for x in by[cores]]
    cs = [x["task_core_sec"] for x in by[cores]]
    print(f"cores={cores} reps={len(thr)} thr_min={min(thr):.1f} "
          f"thr_median={statistics.median(thr):.1f} thr_max={max(thr):.1f} "
          f"core_sec_median={statistics.median(cs):.1f}")
lo, hi = statistics.median([x["domains_per_sec"] for x in by[n]]), \
         statistics.median([x["domains_per_sec"] for x in by[4 * n]])
lo_min, hi_min = min(x["domains_per_sec"] for x in by[n]), \
                 min(x["domains_per_sec"] for x in by[4 * n])
cs_lo = statistics.median(x["task_core_sec"] for x in by[n])
cs_hi = statistics.median(x["task_core_sec"] for x in by[4 * n])
print(f"efficiency_from_medians={(hi/lo)/4.0:.3f}")
print(f"efficiency_from_mins={(hi_min/lo_min)/4.0:.3f}")
print(f"core_sec_inflation_medians={cs_hi/cs_lo:.3f}")
EOF
