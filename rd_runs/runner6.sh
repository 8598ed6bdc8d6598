#!/bin/bash
# Serial TPU job queue v6: v5 + post-probe head re-read (pop race fix).
# v5: v4 +
# LIC_TPU_LOCK_HELD export (bench.py skips its own flock acquire when the
# runner already holds it — a child re-acquire blocks against its parent). runner3 (probe-before-pop, per-job flock shared
# with bench.py) + broader failure detection.  v3 only requeued on the
# axon *init* failure string, so a job whose tunnel died MID-RUN exited 0,
# produced nothing, and was silently dropped.  v4:
#   * requeues on init failures AND mid-run axon/RPC deaths,
#   * caps head-requeues at 3 per job (then appends to the TAIL instead,
#     so a flapping tunnel can't starve the rest of the queue).
# Append jobs with `echo '...' >> rd_runs/queue.txt`; stop by touching
# rd_runs/STOP.  Output goes to rd_runs/chain7.log.
cd /root/repo
Q=rd_runs/queue.txt
L=rd_runs/chain7.log
LOCK=rd_runs/tpu.lockfile

declare -A RETRIES

probe_tpu() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
x = jax.numpy.zeros(8) + 1
assert float(x.sum()) == 8.0
EOF
}

job_failed() {
  # axon init failure, mid-run tunnel death, or RPC-layer errors
  tail -n 60 "$L" | grep -qE \
    "Unable to initialize backend 'axon'|UNAVAILABLE: TPU backend|UNAVAILABLE: (Socket closed|failed to connect)|DEADLINE_EXCEEDED|axon.*(disconnect|unavailable)"
}

while [ ! -f rd_runs/STOP ]; do
  line=$(head -n1 "$Q" 2>/dev/null)
  if [ -z "$line" ]; then sleep 20; continue; fi
  if ! probe_tpu; then
    echo "=== $(date '+%F %T') TPU UNAVAILABLE, holding queue (next: $line)" >> "$L"
    sleep 120
    continue
  fi
  line=$(head -n1 "$Q" 2>/dev/null)   # re-read AFTER the probe: the probe takes minutes and the queue may have been edited (observed 07:10 — a stale pop ate a replacement job and reran a timed-out train)
  if [ -z "$line" ]; then sleep 20; continue; fi
  sed -i '1d' "$Q"
  echo "=== $(date '+%F %T') RUN: $line" >> "$L"
  LIC_TPU_LOCK_HELD=1 flock "$LOCK" bash -c "$line" >> "$L" 2>&1
  rc=$?
  echo "=== $(date '+%F %T') EXIT: $rc :: $line" >> "$L"
  # rc=124/137/143: a `timeout`-killed hang emits no output, so the grep in
  # job_failed cannot see it — treat the timeout itself as a failure (advisor r4).
  if job_failed || [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ] || [ "$rc" -eq 143 ]; then
    n=${RETRIES["$line"]:-0}
    RETRIES["$line"]=$((n + 1))
    if [ "$n" -lt 3 ]; then
      echo "=== $(date '+%F %T') REQUEUE head (failure rc=$rc, attempt $((n + 1))): $line" >> "$L"
      printf '%s\n' "$line" | cat - "$Q" > "$Q.tmp" && mv "$Q.tmp" "$Q"
    else
      echo "=== $(date '+%F %T') REQUEUE tail (axon failure, attempt $((n + 1))): $line" >> "$L"
      printf '%s\n' "$line" >> "$Q"
    fi
    sleep 120
  fi
done
echo "=== $(date '+%F %T') runner5 stopped" >> "$L"
