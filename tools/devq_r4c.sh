#!/bin/bash
# Round-4 phase C device queue (run after devq_r4b.sh): quality-gate the
# SPEED profiles end to end on the temporal harness —
#  1. fast profile (s2d stem + light cell), staged recipe, with the int8
#     precision gates (now that int8 composes with s2d): does the fast
#     profile keep the temporal advantage, and is its int8 delta small?
#  2. hybrid cell, staged recipe: quality cost of lightening scale 0 only
#  3. resnet101@512 full-int8 row (the int8_gru extension on resnet)
cd /root/repo || exit 1
L=/root/repo/tools/devq_r4c.log
: > "$L"
run() {
  echo "=== [$(date -u +%H:%M:%S)] ${*:2}" >> "$L"
  timeout "$1" "${@:2}" >> "$L" 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> "$L"
}
run 5400 python tools/synth_vid_fidelity.py --out /tmp/synth_vid_fast --steps 1500 --seed 0 --precision_check --extra_train_args "--stem s2d --temporal_cell light"
run 5400 python tools/synth_vid_fidelity.py --out /tmp/synth_vid_hybrid --steps 1500 --seed 0 --extra_train_args "--temporal_cell hybrid"
run 900 python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
echo "R4C DONE $(date -u +%H:%M:%S)" >> "$L"
