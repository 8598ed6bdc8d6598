#!/bin/bash
# Round-2b RD chain on the 29-image corpus (corpus v2). Serial — one TPU.
# First entry re-evals the already-trained 0.0067 point (8-step touch-up
# from its saved params) after the eval-subset fix.
set -x
cd /root/repo
R=/root/repo/rd_runs
python scripts/train_real.py --preset source_net --lmbda 0.0067 --steps 8 --init_from $R/v2_src_0.0067/params.npz --out $R/v2_src_0.0067
python scripts/train_real.py --preset source_net --lmbda 0.0025 --steps 40000 --init_from $R/v2_src_0.0067/params.npz --out $R/v2_src_0.0025
python scripts/train_real.py --preset source_net --lmbda 0.0130 --steps 40000 --init_from $R/v2_src_0.0067/params.npz --out $R/v2_src_0.0130
python scripts/train_real.py --preset source_net --lmbda 0.0500 --steps 40000 --init_from $R/v2_src_0.0130/params.npz --out $R/v2_src_0.0500
python scripts/train_real.py --preset net_unet_ha_hs_dec --lmbda 0.0067 --steps 20000 --out $R/v2_flagship_0.0067
