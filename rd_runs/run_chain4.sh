#!/bin/bash
# Source_net extensions: +40k steps per point (cumulative training lifts
# every rate point — run after chain3).
set -x
cd /root/repo
R=/root/repo/rd_runs
python scripts/train_real.py --preset source_net --lmbda 0.0025 --steps 40000 --init_from $R/v2_src_0.0025/params.npz --out $R/v2_src_0.0025
python scripts/train_real.py --preset source_net --lmbda 0.0067 --steps 40000 --init_from $R/v2_src_0.0067/params.npz --out $R/v2_src_0.0067
python scripts/train_real.py --preset source_net --lmbda 0.0130 --steps 40000 --init_from $R/v2_src_0.0130/params.npz --out $R/v2_src_0.0130
python scripts/train_real.py --preset source_net --lmbda 0.0500 --steps 40000 --init_from $R/v2_src_0.0500/params.npz --out $R/v2_src_0.0500
