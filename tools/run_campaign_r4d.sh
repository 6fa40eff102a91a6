#!/bin/bash
# Supervisor for campaign_r4d.sh (stage G): rerun on preemption (exit 75) up to 20x.
# Both stages auto-resume from run_dir checkpoints, so restarts are cheap.
cd "$(dirname "$0")/.."
for attempt in $(seq 1 20); do
  echo "=== campaign r4d attempt $attempt $(date -u +%H:%M:%S) ==="
  bash tools/campaign_r4d.sh
  rc=$?
  if [ $rc -eq 0 ]; then echo "CAMPAIGN DONE rc=0"; exit 0; fi
  if [ $rc -ne 75 ]; then echo "CAMPAIGN FAILED rc=$rc"; exit $rc; fi
  echo "preempted (rc=75); resuming in 15s"; sleep 15
done
echo "CAMPAIGN GAVE UP after 20 preemptions"; exit 1
