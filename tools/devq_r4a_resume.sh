#!/bin/bash
# Round-4 phase A RESUME: the prior session died at 04:46 mid row 3
# (precision_check). Rows 1-2 (hard-model 6000-step train) completed —
# mAP 0.8970, checkpoint alive in /tmp/synth_hard — so this script re-runs
# only rows 3+ and APPENDS to the phase-A log.
cd /root/repo || exit 1
L=/root/repo/tools/devq_r4a.log
echo "=== RESUME $(date -u +%H:%M:%S) (rows 1-2 done earlier; see above)" >> "$L"
run() {
  echo "=== [$(date -u +%H:%M:%S)] ${*:2}" >> "$L"
  timeout "$1" "${@:2}" >> "$L" 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> "$L"
}
run 2400 python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --precision_check --prefilter_check
run 900  python eval.py --dataset voc_320 --data_root /tmp/synth_hard/data --checkpoint /tmp/synth_hard/weights --split 2007:test --batch_size 8 --prefilter 512 --prefilter_recall 0.95
run 2400 python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --qat_check
# --- 2. missing phase-1b rows ---
run 900 python tools/device_bench.py --batch 1 --pad_stem 4 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 16 --stem s2d --cell light --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# --- 3. timed-out train_bench row (frame-mode bf16 vs the 268.6 fp32 anchor) ---
run 900 python tools/train_bench.py --bf16
# --- 4. fast-profile b8 re-measure under the exact top-k default ---
run 900 python tools/device_bench.py --batch 8 --stem s2d --cell light --bf16_weights --prefilter 512
echo "R4A DONE $(date -u +%H:%M:%S)" >> "$L"
