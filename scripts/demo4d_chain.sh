#!/bin/bash
# Chained demo_4d sessions: run scripts/demo4d_prefix.py repeatedly (each
# invocation is a fresh process that resumes from the last grid-state
# checkpoint — the deliberate-restart proof, VERDICT r4 #1) until the full
# 48x150 schedule completes, the session cap is hit, or the deadline
# passes. Budget-bounded sessions end cleanly; the per-session timeout is
# only a hung-relay backstop (sessions are sized to finish well within it).
#
#   bash scripts/demo4d_chain.sh [TASK_BUDGET] [MAX_SESSIONS] [DEADLINE_EPOCH]
#
# Progress artifacts: /tmp/demo4d_chain/session_NN.log (full logs),
# /tmp/demo4d_chain/sessions.jsonl (one line per session: tasks, wall,
# phases) — rolled up into docs/DEMO4D_r05.json at the end.
set -u
BUDGET=${1:-24}
MAX=${2:-40}
DEADLINE=${3:-0}   # 0 = no deadline
# runs/ lives inside the repo checkout: /tmp is wiped on machine resets
# (learned 2026-08-20: a reset mid-chain destroyed the round-1 grid state)
cd "$(dirname "$0")/.."
OUTDIR=runs/demo4d_chain
mkdir -p "$OUTDIR"

for i in $(seq 1 "$MAX"); do
  now=$(date +%s)
  if [ "$DEADLINE" -gt 0 ] && [ "$now" -ge "$DEADLINE" ]; then
    echo "[chain] deadline reached before session $i — stopping cleanly"
    break
  fi
  log="$OUTDIR/session_$(printf %02d "$i").log"
  echo "[chain] session $i starting (budget $BUDGET) at $(date -u +%H:%M:%S)"
  t0=$(date +%s)
  # with a deadline set, also bound the session by wall clock so the LAST
  # session stops cleanly (state saved) instead of running past the
  # deadline on task-budget arithmetic
  tb_args=()
  if [ "$DEADLINE" -gt 0 ]; then
    tb=$((DEADLINE - t0 - 120))
    [ "$tb" -lt 300 ] && tb=300
    tb_args=(--time-budget "$tb")
  fi
  timeout 21000 python scripts/demo4d_prefix.py \
    --task-budget "$BUDGET" --checkpoint-every 8 "${tb_args[@]}" >"$log" 2>&1
  rc=$?
  t1=$(date +%s)
  tail -4 "$log" | sed "s/^/[chain][s$i] /"
  python - "$i" "$rc" "$((t1 - t0))" "$log" <<'EOF'
import json, re, sys
i, rc, wall, log = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
rec = {"session": i, "rc": rc, "wall_s": wall}
txt = open(log, errors="replace").read()
m = re.search(r"executed (\d+) tasks in ([\d.]+)s", txt)
if m:
    rec["tasks"] = int(m.group(1)); rec["exec_s"] = float(m.group(2))
m = re.search(r"resume at round (\d+) \+ (\d+) tasks", txt)
if m:
    rec["start_round"] = int(m.group(1)); rec["start_tasks"] = int(m.group(2))
m = re.search(r'\{"phases": .*\}', txt)
if m:
    rec["phases"] = json.loads(m.group(0))["phases"]
rec["complete"] = "SAMPLING COMPLETE" in txt
with open("runs/demo4d_chain/sessions.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
EOF
  if grep -q "SAMPLING COMPLETE" "$log"; then
    echo "[chain] full schedule complete after session $i"
    break
  fi
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    # real failure (not the timeout backstop): one retry, then bail so a
    # broken state doesn't burn the whole budget
    echo "[chain] session $i failed rc=$rc — retrying once"
    if ! timeout 21000 python scripts/demo4d_prefix.py \
        --task-budget "$BUDGET" --checkpoint-every 8 "${tb_args[@]}" >"$log.retry" 2>&1; then
      echo "[chain] retry failed too — stopping; see $log.retry"
      break
    fi
  fi
done
echo "[chain] done at $(date -u +%H:%M:%S)"
