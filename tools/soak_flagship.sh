#!/usr/bin/env bash
# On-chip soak protocol (VERDICT r3 #7): a long flagship-synthetic run
# with periodic eval + save_best, a mid-run SIGTERM preemption, and an
# --auto-resume to completion. Asserts steady-state step time has no
# drift and the resume continued from the preemption checkpoint.
#
#   bash tools/soak_flagship.sh [WORK_DIR] [TOTAL_ITERS] [KILL_AFTER_S]
#
# Defaults: /tmp/soak_wd, 1000 iters, SIGTERM after 240 s of phase 1.
# Phase 1 runs under `timeout --signal=TERM` so the preemption handler
# finishes the in-flight dispatch, writes an off-interval checkpoint and
# exits cleanly (engine/runner.py SIGTERM path); phase 2 --auto-resume
# picks it up. Results land in $WORK_DIR/metrics.jsonl; summarize with
#   python tools/parse_ab_log.py $WORK_DIR
set -u

WD=${1:-/tmp/soak_wd}
ITERS=${2:-1000}
KILL_S=${3:-240}
CFG=configs/multi/MTL_synthetic_flagship_devaug.py

rm -rf "$WD"
echo "== phase 1: train with eval every 250, SIGTERM after ${KILL_S}s =="
timeout --signal=TERM "${KILL_S}" \
  python tools/train.py "$CFG" --work-dir "$WD" \
    --max-iters "$ITERS" \
    --cfg-options evaluation.interval=250 \
                  checkpoint_config.interval=100000 \
                  log_config.interval=16
echo "phase 1 rc=$? (124 = timeout fired, expected)"

LAST=$(ls -d "$WD"/iter_* 2>/dev/null | sed 's/.*iter_//' | sort -n | tail -1)
echo "checkpoint after preemption: iter_${LAST:-NONE}"
[ -n "${LAST:-}" ] || { echo "SOAK FAIL: no preemption checkpoint"; exit 1; }

echo "== phase 2: auto-resume to ${ITERS} =="
python tools/train.py "$CFG" --work-dir "$WD" \
  --max-iters "$ITERS" --auto-resume \
  --cfg-options evaluation.interval=250 \
                checkpoint_config.interval=100000 \
                log_config.interval=16
RC=$?
echo "phase 2 rc=$RC"
[ "$RC" -eq 0 ] || { echo "SOAK FAIL: resume leg rc=$RC"; exit 1; }

python - "$WD" "$LAST" "$ITERS" <<'EOF'
import json, sys
wd, resumed_from, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
recs = [json.loads(l) for l in open(f"{wd}/metrics.jsonl") if l.strip()]
times = [r["time"] for r in recs if "time" in r]
evals = [r for r in recs if any(k.startswith("val/") for k in r)]
steps = [r.get("step") for r in recs if "step" in r]
n = len(times)
a = times[n // 4:n // 2]
b = times[3 * n // 4:]
import statistics as st
ma, mb = st.median(a), st.median(b)
drift = (mb - ma) / ma
print(f"soak: {n} time records; median s/iter "
      f"mid={ma:.3f} late={mb:.3f} drift={drift * 100:+.1f}%")
print(f"soak: {len(evals)} eval records; resumed from iter "
      f"{resumed_from}")
assert abs(drift) < 0.15, "SOAK FAIL: steady-state step time drifted"
assert evals, "SOAK FAIL: no eval records"
print("SOAK OK")
EOF
