#!/bin/bash
# End-of-round artifact collection (run when the demo chain stops):
#  - docs/DEMO4D_r05.json rollup (sessions + grid progress + coverage)
#  - nerfstudio export manifest over whatever outputs exist
#  - git commit of the artifacts
set -u
cd "$(dirname "$0")/.."
python scripts/demo4d_report.py --out docs/DEMO4D_r05.json || true
python scripts/demo4d_prefix.py --report > /tmp/demo4d_final_report.json 2>&1 || true
tail -1 /tmp/demo4d_final_report.json | python -c "
import json, sys
try:
    rep = json.loads(sys.stdin.read().strip().splitlines()[-1])
    json.dump(rep, open('docs/DEMO4D_r05_export.json', 'w'), indent=2)
    print('export manifest written')
except Exception as e:
    print('export manifest skipped:', e)
" || true
git add docs/DEMO4D_r05.json docs/DEMO4D_r05_export.json 2>/dev/null
git commit -q -m "demo_4d r5 chained-run artifacts (rollup + export manifest)" || true
echo "[wrapup] done"
