#!/bin/bash
# Round-3 session-5 phase-1b: rows missing from phase 1 —
#  * two-frame pipelined streaming at b1 (VERDICT round-2 item 5: chunk=2
#    dispatches frame t+1 before fetching frame t; one frame extra latency)
#  * best-known b1 latency combo (int8_full + pad_stem)
#  * b16 headline-profile candidates for bench.py (current headline 1029
#    FPS/chip @16 streams bf16; int8_full may beat it)
cd /root/repo || exit 1
L=/tmp/devq1b.log
: > $L
run() {
  echo "=== [$(date -u +%H:%M:%S)] $*" >> $L
  timeout 900 "$@" >> $L 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> $L
}
# 0. retry of the phase-1 int8 b8 row that timed out at 580s (first compile
#    of the calibration + quantized programs; partially cached now)
run python tools/device_bench.py --batch 8 --stem conv --int8 --bf16_weights --prefilter 512
# 1. single-stream pipelining ladder
run python tools/device_bench.py --batch 1 --chunk 2 --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --chunk 4 --bf16_weights --prefilter 512
# 2. best-latency combo at b1
run python tools/device_bench.py --batch 1 --pad_stem 4 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# 3. b16 headline candidates (match bench.py geometry: vid_320 conv/convgru)
run python tools/device_bench.py --batch 16 --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 16 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 16 --stem s2d --cell light --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# 4. off-thread fetch probe (added to tpu_checks after phase 1 started)
run python -c "import sys; sys.path.insert(0,'.'); sys.path.insert(0,'tools'); import tpu_checks; tpu_checks.check_offthread_fetch()"
echo "PHASE1B DONE $(date -u +%H:%M:%S)" >> $L
