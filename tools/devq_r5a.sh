#!/bin/bash
# Round-5 phase A: finish the temporal int8 quality gates (VERDICT r4 item 1)
# using the train-once-eval-many protocol (item 3): round-4's /tmp checkpoint
# dirs survived, so every gate except the default profile's clip fine-tune is
# EVAL-ONLY (synth_vid_fidelity --skip_gen --skip_train). The clip fine-tune
# itself is chunked (--save_every 500 --resume) + a retry row so a timeout
# costs at most 500 steps (the discipline phase A of round 4 proved).
#
# Run serialized, never through the driver snapshot window, no nohup chains
# (VERDICT r4 weak #1). Results land in tools/devq_r5a.log.
set -u
cd /root/repo
LOG=tools/devq_r5a.log
PY=python

row() {
  local to=$1; shift
  echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- exit=$? [$(date +%H:%M:%S)]" >> "$LOG"
}

CLIP_TRAIN=($PY train.py --clip --seq_len 8 --batch_size 4 --max_iter 1500
  --save_folder /tmp/synth_vid/weights_clip --save_every 500 --resume
  --init_from /tmp/synth_vid/weights_frame
  --dataset vid_320 --data_root /tmp/synth_vid/data
  --lr 0.001 --warmup 150 --milestones 1125
  --no_photometric --log_every 50 --seed 0 --grad_clip 10)

# Rows 1-2: default-profile clip fine-tune, resumable; row 2 is the retry
# (no-op if row 1 finished: resume sees step 1500 and exits after 0 steps).
row 2700 "${CLIP_TRAIN[@]}"
row 2700 "${CLIP_TRAIN[@]}"

# Row 3: THE promotion gate — default profile temporal precision_check
# (fp32/bf16/int8/int8_tcb/int8_full deltas, eval-only on the checkpoint).
row 3600 $PY tools/synth_vid_fidelity.py --out /tmp/synth_vid \
  --skip_gen --skip_train --precision_check

# Row 4: fast-profile (s2d+light) gate — the 1792-FPS headline candidate.
row 3600 $PY tools/synth_vid_fidelity.py --out /tmp/synth_vid_fast \
  --skip_gen --skip_train --precision_check

# Row 5: hybrid-cell gate (654-FPS single-stream candidate) + its int8 deltas.
row 3600 $PY tools/synth_vid_fidelity.py --out /tmp/synth_vid_hybrid \
  --skip_gen --skip_train --precision_check

# Row 6: cold-start mixed-frames A/B — training already DONE at step 3000
# (devq_r4b timed out inside the eval); this is just the eval.
row 1800 $PY tools/synth_vid_fidelity.py --out /tmp/synth_vid_cold \
  --skip_gen --skip_train --no-staged --mixed_frames 16

# Row 7: per-round on-device invariants (NOTE: exits 1 when the approx-topk
# canary fires, which is the EXPECTED state — informational, not a failure).
row 1200 $PY tools/tpu_checks.py

echo "R5A DONE $(date +%H:%M:%S)" >> "$LOG"
