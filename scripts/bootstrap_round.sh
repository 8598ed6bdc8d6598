#!/bin/bash
# Round-boundary bootstrap: the driver's VM reset purges rd_runs/*/params.npz
# (checkpoints are kept out of git — see rd_runs/STATUS.md).  This script
# refills the queue with the value-first recovery jobs and starts the runner.
#
#   bash scripts/bootstrap_round.sh
#
# Safe to re-run: it only prepends jobs whose checkpoint is missing, refuses
# to start a second runner, and never touches the queue while a runner is
# draining it (runner5.sh mutates queue.txt concurrently via sed -i and its
# requeue cat/mv — editing it here would lose or duplicate jobs).
cd "$(dirname "$0")/.." || exit 1
Q=rd_runs/queue.txt

runner_active() {
  pgrep -x flock >/dev/null 2>&1 ||
    { [ -f /tmp/runner.pid ] && kill -0 "$(cat /tmp/runner.pid)" 2>/dev/null; }
}

touch "$Q"

if runner_active; then
  echo "runner already active (pid $(cat /tmp/runner.pid 2>/dev/null)) — queue left untouched"
  exit 0
fi

if [ ! -f rd_runs/v2_src_0.0130/params.npz ]; then
  if ! grep -q "out rd_runs/v2_src_0.0130$" "$Q"; then
    printf '%s\n' \
      "timeout -k 60 2700 python scripts/train_real.py --preset source_net --lmbda 0.0130 --steps 20000 --tag regen --out rd_runs/v2_src_0.0130" \
      | cat - "$Q" > "$Q.tmp" && mv "$Q.tmp" "$Q"
    echo "queued bench-checkpoint regen (bench.py falls back to random init without it)"
  fi
  if ! grep -qx "python bench.py" "$Q"; then
    # insert bench right after the regen job (line 1)
    sed -i '1a python bench.py' "$Q"
    echo "queued bench.py after the regen"
  fi
fi

rm -f rd_runs/STOP
nohup bash rd_runs/runner6.sh >/dev/null 2>&1 &
echo $! > /tmp/runner.pid
echo "runner6 started (pid $(cat /tmp/runner.pid)); log: rd_runs/chain7.log"
