#!/bin/bash
# Serial TPU job queue v2: consumes rd_runs/queue.txt one line at a time.
#
# Differences vs runner.sh:
#   * Before popping a job, probes TPU availability with a bounded
#     `jax.devices()` (timeout 240s).  While the axon tunnel is down the
#     queue is left intact and we sleep-retry instead of burning a job on
#     a ~25-min init failure (which is what happened to 4 queued runs on
#     2026-08-17 20:19-22:02).
#   * After a job, if the log's last lines contain an axon-UNAVAILABLE
#     traceback, the job is requeued at the head.
# Append jobs with `echo '...' >> rd_runs/queue.txt`; stop by touching
# rd_runs/STOP.  Output goes to rd_runs/chain7.log.
cd /root/repo
Q=rd_runs/queue.txt
L=rd_runs/chain7.log

probe_tpu() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
x = jax.numpy.zeros(8) + 1
assert float(x.sum()) == 8.0
EOF
}

while [ ! -f rd_runs/STOP ]; do
  line=$(head -n1 "$Q" 2>/dev/null)
  if [ -z "$line" ]; then sleep 20; continue; fi
  if ! probe_tpu; then
    echo "=== $(date '+%F %T') TPU UNAVAILABLE, holding queue (next: $line)" >> "$L"
    sleep 120
    continue
  fi
  sed -i '1d' "$Q"
  echo "=== $(date '+%F %T') RUN: $line" >> "$L"
  eval "$line" >> "$L" 2>&1
  rc=$?
  echo "=== $(date '+%F %T') EXIT: $rc :: $line" >> "$L"
  if tail -n 40 "$L" | grep -q "Unable to initialize backend 'axon'"; then
    echo "=== $(date '+%F %T') REQUEUE (axon init failure): $line" >> "$L"
    printf '%s\n' "$line" | cat - "$Q" > "$Q.tmp" && mv "$Q.tmp" "$Q"
    sleep 120
  fi
done
echo "=== $(date '+%F %T') runner2 stopped" >> "$L"
