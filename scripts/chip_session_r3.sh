#!/bin/bash
# Round-3 chip session: run everything that needs the real TPU, in order,
# logging to /tmp. Kick off once the axon relay is back:
#   nohup bash scripts/chip_session_r3.sh > /tmp/chip_r3.log 2>&1 &
set -x
cd /root/repo

# 0. re-sweep the attention dispatch table (adds v5 single-KV-pass
#    candidates for the small/medium-S shapes) — bench then uses the
#    refreshed winners
timeout 3600 python scripts/tune_attention.py > /tmp/tune_attention_r3.log 2>&1 || true

# 1. headline bench (smoke tier -> warm -> cold), watchdog-guarded
BENCH_TIMEOUT_S=4200 timeout 4500 python bench.py > /tmp/bench_r3.json.log 2>/tmp/bench_r3.err.log

# 2. demo_4d-scale slice: full 48x150 grid, production task per domain,
#    checkpoint+resume proof
timeout 4500 python scripts/demo4d_slice.py --scene /tmp/d4d_4d_scene \
  > /tmp/demo4d_slice_r3.log 2>&1

# 3. per-unit window profile (MFU breakdown for STATUS)
timeout 2400 python scripts/profile_window.py > /tmp/profile_window_r3.log 2>&1 || true
timeout 2400 python scripts/profile_units.py > /tmp/profile_units_r3.log 2>&1 || true

echo "chip session done: $(date)"
