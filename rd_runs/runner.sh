#!/bin/bash
# Serial TPU job queue: consumes rd_runs/queue.txt one line at a time.
# Append jobs with `echo '...' >> rd_runs/queue.txt`; stop by touching
# rd_runs/STOP. Each job is a fresh process, so code edits between jobs
# take effect. All output goes to rd_runs/chain7.log.
cd /root/repo
Q=rd_runs/queue.txt
L=rd_runs/chain7.log
while [ ! -f rd_runs/STOP ]; do
  line=$(head -n1 "$Q" 2>/dev/null)
  if [ -z "$line" ]; then sleep 20; continue; fi
  sed -i '1d' "$Q"
  echo "=== $(date '+%F %T') RUN: $line" >> "$L"
  eval "$line" >> "$L" 2>&1
  echo "=== $(date '+%F %T') EXIT: $? :: $line" >> "$L"
done
echo "=== $(date '+%F %T') runner stopped" >> "$L"
