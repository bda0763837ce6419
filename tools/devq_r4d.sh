#!/bin/bash
# Round-4 phase D device queue (run after devq_r4c.sh): headline promotion
# confirmation + composition rows unlocked by the phase-B/C gates.
#  1. bench.py (the driver's headline harness) with the int8_full profile —
#     confirm the pipelined-harness number matches device_bench's 1520 FPS
#     b16 row before flipping bench.py defaults.
#  2. hybrid-cell x int8 composition: if the phase-C hybrid quality gate
#     passes, conv+hybrid+int8_full is the near-parity headline candidate
#     between 1520 (convgru) and 1792 (s2d+light).
#  3. best single-stream combo: chunked + pad_stem + int8_full.
#  4. s2d+light bf16 b16 (the only missing b16 ladder rung).
cd /root/repo || exit 1
L=/root/repo/tools/devq_r4d.log
: > "$L"
run() {
  echo "=== [$(date -u +%H:%M:%S)] ${*:2}" >> "$L"
  timeout "$1" "${@:2}" >> "$L" 2>&1
  echo "--- exit=$? [$(date -u +%H:%M:%S)]" >> "$L"
}
# --- 1. headline-harness confirmation ---------------------------------------
run 900 python bench.py --frames 100 --warmup 10 --batch 16 --int8 --int8_tcb --int8_gru
# --- 2. hybrid x int8 composition -------------------------------------------
run 900 python tools/device_bench.py --batch 16 --cell hybrid --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 8 --cell hybrid --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# --- 3. single-stream: chunk x pad x int8 -----------------------------------
run 900 python tools/device_bench.py --batch 1 --chunk 4 --pad_stem 4 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
run 900 python tools/device_bench.py --batch 1 --chunk 4 --cell hybrid --pad_stem 4 --int8 --int8_tcb --int8_gru --bf16_weights --prefilter 512
# --- 4. b16 ladder completion ------------------------------------------------
run 900 python tools/device_bench.py --batch 16 --stem s2d --cell light --bf16_weights --prefilter 512
echo "R4D DONE $(date -u +%H:%M:%S)" >> "$L"
