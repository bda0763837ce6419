#!/bin/bash
# Round-4 phase B device queue (run after devq_r4a.sh):
#  1. VID temporal harness: staged training + precision gates (bf16/int8/
#     int8_tcb/int8_full deltas on the TEMPORAL model — the gate the bench.py
#     headline promotion actually needs, since bench.py measures the
#     streaming temporal model)
#  2. cold-start mixed frame+clip A/B at matched 3000-step budget
#     (VERDICT r3 item 4; anchors: cold 0.310 @3000, frame 0.593, staged 0.737)
#  3. int8 x s2d fast profile (newly supported, VERDICT item 3)
#  4. hybrid temporal cell: single-stream latency rows (VERDICT item 8)
#  5. the never-measured int8+tcb vgg tier
#  6. per-round invariants (tpu_checks) + an int8_full profile trace for the
#     early-conv analysis (VERDICT weak #1 design (c))
cd /root/repo || exit 1
L=/root/repo/tools/devq_r4b.log
: > "$L"
run() {
  echo "=== [$(date -u +%H:%M:%S)] ${*:2}" >> "$L"
  timeout "$1" "${@:2}" >> "$L" 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> "$L"
}
# --- 1. temporal precision gates (staged recipe; ~1500+1500 steps) ---------
run 4500 python tools/synth_vid_fidelity.py --out /tmp/synth_vid --steps 1500 --seed 0 --precision_check
# --- 2. cold-start mixed-frames A/B (3000 optimizer steps total) -----------
run 7200 python tools/synth_vid_fidelity.py --out /tmp/synth_vid_cold --no-staged --steps 3000 --mixed_frames 16 --seed 0
# --- 3. int8 x s2d fast profile ---------------------------------------------
run 900 python tools/device_bench.py --batch 8 --stem s2d --cell light --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --stem s2d --cell light --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# --- 4. hybrid cell: single-stream latency + batch throughput ---------------
run 900 python tools/device_bench.py --batch 1 --chunk 4 --cell hybrid --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 1 --chunk 8 --cell hybrid --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 8 --cell hybrid --bf16_weights --prefilter 512
# --- 5. int8+tcb vgg tier (completes the b8 ladder) -------------------------
run 900 python tools/device_bench.py --batch 8 --int8 --int8_tcb --bf16_weights --prefilter 512
# --- 6. invariants + int8_full trace ----------------------------------------
run 600 python tools/tpu_checks.py
run 900 python profile_trace.py --batch 8 --bf16_weights --int8 --int8_tcb --int8_gru --prefilter 512 --out /tmp/trace_int8_full
echo "R4B DONE $(date -u +%H:%M:%S)" >> "$L"
