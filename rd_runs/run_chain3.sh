#!/bin/bash
# Flagship extension: +20k steps at 0.0067 (cumulative 40k), then a low-rate
# point warm-started from it.
set -x
cd /root/repo
R=/root/repo/rd_runs
python scripts/train_real.py --preset net_unet_ha_hs_dec --lmbda 0.0067 --steps 20000 --init_from $R/v2_flagship_0.0067/params.npz --out $R/v2_flagship_0.0067
python scripts/train_real.py --preset net_unet_ha_hs_dec --lmbda 0.0025 --steps 20000 --init_from $R/v2_flagship_0.0067/params.npz --out $R/v2_flagship_0.0025
