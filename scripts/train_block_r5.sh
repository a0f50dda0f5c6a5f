#!/bin/bash
# Round-5 training evidence block (VERDICT #4/#5/#9), run back-to-back
# while the sampling chain is paused:
#   1. TRAIN_r05.json tier: full 0.87B f12 step with the differentiable
#      Pallas attention (adopted train path)
#   2. TRAIN_r05.json tier: same + host-offloaded fp32 EMA on chip
#   3. loss-curve run session 1 (120 steps) + resumed session 2 (to 300)
#   4. flash-backward kernel A/B at the training 3D shapes
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/train_block
echo "[block] 1: f12 train step (attn=train)" && \
timeout 2400 python scripts/train_step_chip.py --frames 12 --steps 3 \
  --out TRAIN_r05.json > /tmp/train_block/step_f12.log 2>&1
tail -2 /tmp/train_block/step_f12.log
echo "[block] 2: f12 + host EMA" && \
timeout 2400 python scripts/train_step_chip.py --frames 12 --steps 3 \
  --ema host --out TRAIN_r05.json > /tmp/train_block/step_f12_ema.log 2>&1
tail -2 /tmp/train_block/step_f12_ema.log
echo "[block] 3a: loss run session 1 (120 steps)" && \
timeout 3000 python scripts/train_run_chip.py --steps 120 \
  > /tmp/train_block/loss_run1.log 2>&1
tail -1 /tmp/train_block/loss_run1.log
echo "[block] 3b: loss run session 2 (resume -> 300)" && \
timeout 3600 python scripts/train_run_chip.py --steps 300 \
  > /tmp/train_block/loss_run2.log 2>&1
tail -1 /tmp/train_block/loss_run2.log
echo "[block] 4: flash backward A/B (3D train shapes)" && \
timeout 2400 python scripts/bench_flash_backward.py --shapes train_3d \
  --out docs/FLASH_BWD_r05.json > /tmp/train_block/flash_bwd.log 2>&1
tail -3 /tmp/train_block/flash_bwd.log
echo "[block] done at $(date -u +%H:%M:%S)"
