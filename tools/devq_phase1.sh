#!/bin/bash
# Round-3 session-5 phase-1 device queue: pure benchmarks, priority order
# (most valuable first in case the tunnel drops again). No /tmp/synth_hard
# dependency — quality gates run in phase 2 after the hard model retrains.
cd /root/repo || exit 1
L=/tmp/devq.log
: > $L
run() {
  echo "=== [$(date -u +%H:%M:%S)] $*" >> $L
  timeout 580 "$@" >> $L 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> $L
}
# 0. Per-round invariants (approx_topk tie order, s8xs8 lowering, cache probe)
run python tools/tpu_checks.py
# 1. b8 serving-profile ladder: conv baseline -> poly/poly2 stems -> int8 tiers
run python tools/device_bench.py --batch 8 --stem conv  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem poly  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem poly2 --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem conv --int8 --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem conv --int8 --int8_tcb --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 8 --stem conv --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# 2. b1 latency ladder
run python tools/device_bench.py --batch 1 --stem conv  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem poly  --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem poly2 --bf16_weights --prefilter 512
run python tools/device_bench.py --batch 1 --stem conv --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# 3. fast-profile b8 re-measure under exact-topk default (round-2 pending item)
run python tools/device_bench.py --batch 8 --stem s2d --cell light --bf16_weights --prefilter 512
# 3b. fast profile + full int8 (best-known-speed candidate)
run python tools/device_bench.py --batch 8 --stem s2d --cell light --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# 4. ResNet-101 @512 tiers (vs round-2 fp32 8.0 ms b4)
run python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --bf16_weights --prefilter 512
run python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --int8 --bf16_weights --prefilter 512
run python tools/device_bench.py --config vid_512 --backbone resnet101 --batch 4 --int8 --int8_tcb --bf16_weights --prefilter 512
# 5. approx prefilter selection at b1/b8
run python tools/device_bench.py --batch 1 --stem conv --bf16_weights --prefilter 512 --prefilter_recall 0.95
run python tools/device_bench.py --batch 8 --stem conv --bf16_weights --prefilter 512 --prefilter_recall 0.95
# 6. training-throughput mixed-precision A/B (vs 268.6 frame / 130 clip)
run python tools/train_bench.py
run python tools/train_bench.py --bf16
run python tools/train_bench.py --clip
run python tools/train_bench.py --clip --bf16
echo "PHASE1 DONE $(date -u +%H:%M:%S)" >> $L
