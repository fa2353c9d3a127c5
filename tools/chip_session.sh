#!/bin/bash
# Sequential TPU session: headline bench -> pairing/MNT bench -> MSM profile.
# One TPU process at a time (memory: two contend catastrophically).
# Each step under `timeout` so a hang can't eat the whole session.
# BENCH_DEADLINE_S is lifted: this session's job is to warm the persistent
# cache on the driver's exact default shapes and capture full numbers.
cd /root/repo
export BENCH_DEADLINE_S=100000
echo "=== [1/4] headline bench (MSM 2^20 + NTT + Fr + prove 2^20) $(date +%H:%M)"
timeout 7200 python -u bench.py > /tmp/bench_full.log 2>&1
echo "exit $? $(date +%H:%M)"; tail -1 /tmp/bench_full.log
echo "=== [2/4] pairing + batched-verify + MNT verify bench $(date +%H:%M)"
BENCH_SKIP_PROVE=1 BENCH_SKIP_NTT=1 BENCH_SKIP_FR=1 BENCH_MSM_BITS=16 \
  BENCH_PAIRING=1 BENCH_VERIFY=1 BENCH_MNT=1 \
  timeout 7200 python -u bench.py > /tmp/bench_pairing.log 2>&1
echo "exit $? $(date +%H:%M)"; tail -1 /tmp/bench_pairing.log
echo "=== [3/4] MSM stage profile @2^20 c=16 $(date +%H:%M)"
timeout 3600 python -u tools/profile_msm.py --bits 20 --window 16 > /tmp/profile_msm.log 2>&1
echo "exit $? $(date +%H:%M)"; tail -20 /tmp/profile_msm.log
echo "=== [4/4] window sweep @2^20 $(date +%H:%M)"
for w in 13 14 15 16; do
  BENCH_MSM_BITS=20 BENCH_WINDOW_BITS=$w BENCH_SKIP_NTT=1 BENCH_SKIP_FR=1 \
    BENCH_SKIP_PROVE=1 timeout 2400 python -u bench.py > /tmp/bench_w$w.log 2>&1
  echo "w=$w: $(tail -1 /tmp/bench_w$w.log)"
done
echo "=== chip session done $(date +%H:%M)"
