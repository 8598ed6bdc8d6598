#!/bin/bash
# Complete the flagship 4-lambda curve + a net_ga (rich+ELIC, eval entry)
# point. Serial — one TPU.
set -x
cd /root/repo
R=/root/repo/rd_runs
python scripts/train_real.py --preset net_unet_ha_hs_dec --lmbda 0.0130 --steps 20000 --init_from $R/v2_flagship_0.0067/params.npz --out $R/v2_flagship_0.0130
python scripts/train_real.py --preset net_unet_ha_hs_dec --lmbda 0.0500 --steps 20000 --init_from $R/v2_flagship_0.0130/params.npz --out $R/v2_flagship_0.0500
python scripts/train_real.py --preset net_ga --lmbda 0.0067 --steps 20000 --out $R/v2_netga_0.0067
