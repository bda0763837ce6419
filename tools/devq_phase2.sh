#!/bin/bash
# Round-3 session-5 phase-2 device queue: regenerate the hard fidelity model
# (/tmp was wiped between sessions) and run the int8/QAT/prefilter quality
# gates on it. Run AFTER devq_phase1.sh.
cd /root/repo || exit 1
L=/tmp/devq2.log
: > $L
run() {
  echo "=== [$(date -u +%H:%M:%S)] $*" >> $L
  timeout "$1" "${@:2}" >> $L 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> $L
}
# 1. Regenerate + retrain the hard cluttered model (round-3 anchor: mAP 0.9184
#    @6000 steps seed 0). Training runs on the real chip.
run 1800 python tools/synth_fidelity.py --hard --out /tmp/synth_hard --steps 6000 --seed 0
# 2. Precision + prefilter gates on the hard model (bf16/int8/int8_tcb deltas,
#    exact-vs-prefilter per-class deltas on the dense score field)
run 1200 python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --precision_check --prefilter_check
# 3. Approximate prefilter selection mAP delta on the hard model
run 900 python eval.py --dataset voc_320 --data_root /tmp/synth_hard/data --checkpoint /tmp/synth_hard/weights --split 2007:test --batch_size 8 --prefilter 512 --prefilter_recall 0.95
# 4. QAT recovery check (only meaningful if 2 shows a visible int8 delta)
run 1800 python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --qat_check
echo "PHASE2 DONE $(date -u +%H:%M:%S)" >> $L
