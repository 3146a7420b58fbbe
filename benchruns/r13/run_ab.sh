#!/bin/bash
# Process-level interleaved A/B (VERDICT r12 item 1):
# arm r12 = current defaults (worker.reuse=false, daemon preload on)
# arm r11 = SPARK_GRAFT_PY_WORKER_REUSE=true SPARK_GRAFT_PY_DAEMON_PRELOAD=0
cd /root/ab13
COMMON="SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_TOP_REPS=2 SPARK_GRAFT_BENCH_DRIFT=0 SPARK_GRAFT_BENCH_PLANS=0"
run_arm() {  # $1 = seq no, $2 = arm name
  local extra=""
  if [ "$2" = "r11" ]; then extra="SPARK_GRAFT_PY_WORKER_REUSE=true SPARK_GRAFT_PY_DAEMON_PRELOAD=0"; fi
  echo "=== run $1 arm $2 start $(date +%T) ===" >> ab_logs/progress.txt
  env $COMMON $extra python bench.py > "ab_logs/run${1}_${2}.json" 2> "ab_logs/run${1}_${2}.err"
  echo "=== run $1 arm $2 done  $(date +%T) rc=$? ===" >> ab_logs/progress.txt
}
# alternate order across pairs to cancel monotonic box drift
run_arm 1 r12; run_arm 2 r11
run_arm 3 r11; run_arm 4 r12
run_arm 5 r12; run_arm 6 r11
echo ALL_DONE >> ab_logs/progress.txt
