#!/bin/bash
# Run one config-4 campaign arm under fault forensics (DESIGN.md §8g).
# On a TPU-worker crash the child dies without appending its row, so this
# wrapper appends {ok:false, rc, tail} to CFG4_CAMPAIGN.json instead.
# Usage: tools/cfg4_arm.sh <logfile> [run_cfg4_epoch.py args...]
# No `timeout` guard: killing a TPU client wedges the tunnel for 15-60 min
# (verify skill); a worker crash exits the child on its own.
set -u
LOG="$1"; shift
cd "$(dirname "$0")/.."
/opt/venv/bin/python tools/run_cfg4_epoch.py "$@" >"$LOG" 2>&1
rc=$?
if [ $rc -ne 0 ]; then
  ARGS="$*" RC="$rc" LOGF="$LOG" /opt/venv/bin/python - <<'EOF'
import json, os
OUT = "CFG4_CAMPAIGN.json"
rows = json.load(open(OUT)) if os.path.exists(OUT) else []
tail = open(os.environ["LOGF"], errors="replace").read()[-1500:]
rows.append({"args": os.environ["ARGS"], "rc": int(os.environ["RC"]),
             "ok": False, "tail": tail})
with open(OUT + ".tmp", "w") as fh:
    json.dump(rows, fh, indent=1)
os.replace(OUT + ".tmp", OUT)
print("fault row appended, rc", os.environ["RC"])
EOF
fi
exit 0
