#!/bin/bash
# Round-5 CLI verify: codec roundtrip + progressive (gaussian digit model)
# on the trained bench checkpoint.  Runs under the rd_runs queue (TPU).
set -e
cd /root/repo
CKPT=rd_runs/v2_src_0.0130/params.npz
IMG=/tmp/gh_r5.jpg
cp /opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg "$IMG"

echo "== plain roundtrip =="
python -m lic_tpu.cli.codec compress "$IMG" /tmp/gh_r5.ltc \
  --weight_path "$CKPT" --preset source_net
python -m lic_tpu.cli.codec decompress /tmp/gh_r5.ltc /tmp/gh_r5_rec.png \
  --weight_path "$CKPT" --preset source_net

echo "== progressive (gaussian digit model) =="
python -m lic_tpu.cli.codec compress "$IMG" /tmp/gh_r5.ltcp \
  --weight_path "$CKPT" --preset source_net --progressive
python -m lic_tpu.cli.codec decompress /tmp/gh_r5.ltcp /tmp/gh_r5_prog.png \
  --weight_path "$CKPT" --preset source_net --progressive
ls -la /tmp/gh_r5.ltc /tmp/gh_r5.ltcp
echo "VERIFY_CLI_R5 OK"
