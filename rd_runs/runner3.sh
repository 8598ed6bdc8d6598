#!/bin/bash
# Serial TPU job queue v3: runner2 + a flock on rd_runs/tpu.lockfile held
# for the duration of each job.  bench.py (run by the round driver at any
# time) takes the same lock, so a queue job and the driver's benchmark can
# never own the TPU simultaneously — they serialize instead of corrupting
# each other's timings (only ONE process may use the tunneled chip at a
# time, and contention skews MP/s numbers).
#
# Append jobs with `echo '...' >> rd_runs/queue.txt`; stop by touching
# rd_runs/STOP.  Output goes to rd_runs/chain7.log.
cd /root/repo
Q=rd_runs/queue.txt
L=rd_runs/chain7.log
LOCK=rd_runs/tpu.lockfile

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
  flock "$LOCK" bash -c "$line" >> "$L" 2>&1
  rc=$?
  echo "=== $(date '+%F %T') EXIT: $rc :: $line" >> "$L"
  if tail -n 40 "$L" | grep -q "Unable to initialize backend 'axon'"; then
    echo "=== $(date '+%F %T') REQUEUE (axon init failure): $line" >> "$L"
    printf '%s\n' "$line" | cat - "$Q" > "$Q.tmp" && mv "$Q.tmp" "$Q"
    sleep 120
  fi
done
echo "=== $(date '+%F %T') runner3 stopped" >> "$L"
