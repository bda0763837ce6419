#!/bin/bash
# Round-4 phase A device queue (VERDICT r3 items 1 and 5):
#  1. the never-run int8/QAT quality gates (devq_phase2.sh contents, inlined
#     so one script owns the round-4 log)
#  2. the phase-1b rows cut off when round 3 ended: best-latency b1 combo and
#     the b16 headline candidates
#  3. the timed-out train_bench bf16 frame row
# Results land in tools/devq_r4a.log (committed when done).
cd /root/repo || exit 1
L=/root/repo/tools/devq_r4a.log
: > "$L"
run() {
  echo "=== [$(date -u +%H:%M:%S)] ${*:2}" >> "$L"
  timeout "$1" "${@:2}" >> "$L" 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> "$L"
}
# --- 1. quality gates (hard cluttered model; /tmp wiped between sessions) ---
run 2400 python tools/synth_fidelity.py --hard --out /tmp/synth_hard --steps 6000 --seed 0
run 1500 python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --precision_check --prefilter_check
run 900  python eval.py --dataset voc_320 --data_root /tmp/synth_hard/data --checkpoint /tmp/synth_hard/weights --split 2007:test --batch_size 8 --prefilter 512 --prefilter_recall 0.95
run 2400 python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --qat_check
# --- 2. missing phase-1b rows ---
run 900 python tools/device_bench.py --batch 1 --pad_stem 4 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --stem s2d --cell light --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# --- 3. timed-out train_bench row (frame-mode bf16 vs the 268.6 fp32 anchor) ---
run 900 python tools/train_bench.py --bf16
# --- 4. fast-profile b8 re-measure under the exact top-k default (NOTES.md
#        round-3-close pending item) ---
run 900 python tools/device_bench.py --batch 8 --stem s2d --cell light --bf16_weights --prefilter 512
echo "R4A DONE $(date -u +%H:%M:%S)" >> "$L"
