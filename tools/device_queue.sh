#!/bin/bash
# Pending device-measurement queue (round-3 session-3; run when the axon
# tunnel is back). Results -> /tmp/devq.log; transcribe into BENCH.md/NOTES.md.
# All configs compile-smoked on the CPU backend at full geometry first.
cd /root/repo || exit 1
L=/tmp/devq.log
: > $L
run() {
  echo "=== [$(date -u +%H:%M:%S)] $*" >> $L
  timeout 580 "$@" >> $L 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> $L
}
# 0. Per-round invariant check (NOTES: run every round)
run python tools/tpu_checks.py
# 1. Stem A/B at b8, default serving profile (bf16 weights + prefilter 512, exact topk)
run python tools/device_bench.py --batch 8 --stem conv  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem poly  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem poly2 --bf16_weights --prefilter 512
# 2. Stem A/B at b1 (latency profile; compare also against pad_stem 4 = 1.893)
run python tools/device_bench.py --batch 1 --stem conv  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem poly  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem poly2 --bf16_weights --prefilter 512
# 3. Pending fast-profile b8 re-measure under exact-topk default
run python tools/device_bench.py --batch 8 --stem s2d --cell light --bf16_weights --prefilter 512
# 4. int8 backbone (round-3 session-3 feature): vs the bf16 rows above
run python tools/device_bench.py --batch 8 --stem conv --int8 --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem conv --int8 --bf16_weights --prefilter 512
# 4b. int8 extended to TCB pyramid convs (session-4): vs the --int8 rows
run python tools/device_bench.py --batch 8 --stem conv --int8 --int8_tcb --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem conv --int8 --int8_tcb --bf16_weights --prefilter 512
# 4b'. full-int8 pyramid incl. the ConvGRU (the default profile's 2 biggest convs)
run python tools/device_bench.py --batch 8 --stem conv --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem conv --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# 4c. int8 ResNet-101 @512 (session-4): vs the round-2 fp32 8.0 ms b4 row
run python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --bf16_weights --prefilter 512
run python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --int8 --bf16_weights --prefilter 512
run python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --int8 --int8_tcb --bf16_weights --prefilter 512
# 4d. int8 quality gate on the HARD (mAP 0.918) model: bf16/int8/int8_tcb deltas
run python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --precision_check --prefilter_check
# 4e. approximate prefilter selection (config.prefilter_recall < 1.0): perf at
# b1 (the (P,) sort is ~0.15 ms there) + mAP delta on the hard model
run python tools/device_bench.py --batch 1 --stem conv --bf16_weights --prefilter 512 --prefilter_recall 0.95
run python tools/device_bench.py --batch 8 --stem conv --bf16_weights --prefilter 512 --prefilter_recall 0.95
run python eval.py --dataset voc_320 --data_root /tmp/synth_hard/data --checkpoint /tmp/synth_hard/weights --split 2007:test --batch_size 8 --prefilter 512 --prefilter_recall 0.95
# 5. training-throughput mixed-precision A/B (vs 268.6 frame / 130 clip anchors)
run python tools/train_bench.py
run python tools/train_bench.py --bf16
run python tools/train_bench.py --clip
run python tools/train_bench.py --clip --bf16
# 6. QAT (session-5): if 4d shows a visible int8/int8_tcb mAP delta on the
# hard model, quantify how much the QAT fine-tune recovers (calibrate ->
# train.py --qat --init_from -> int8 eval on the SAME scales).
run python tools/synth_fidelity.py --hard --skip_gen --skip_train --out /tmp/synth_hard --qat_check
echo "QUEUE DONE $(date -u +%H:%M:%S)" >> $L
