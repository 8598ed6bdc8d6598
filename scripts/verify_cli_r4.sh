#!/bin/bash
# Canonical verify drive (see .claude/skills/verify) on the neural_syntax
# preset — its single-image compress/decompress now routes through the
# batched wavefront scan (B=1), so the CLI surface must be re-driven on
# the TPU host: real photo, non-/64 size (padding), truncation probe.
set -e
cd "$(dirname "$0")/.."

python - <<'EOF'
import sys; sys.path.insert(0, ".")
from lic_tpu.utils.cache import enable_compilation_cache; enable_compilation_cache()
import jax, jax.numpy as jnp
from lic_tpu.models import build_model
from lic_tpu.utils.checkpoint import save_params
m = build_model("neural_syntax")
v = m.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.zeros((1, 256, 256, 3), jnp.float32), training=True)
save_params("/tmp/ns_init.npz", v["params"])
print("weights fixture written")
EOF

cp /opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/grace_hopper.jpg /tmp/gh.jpg
python -m lic_tpu.cli.codec compress /tmp/gh.jpg /tmp/gh_ns.ltc \
    --weight_path /tmp/ns_init.npz --preset neural_syntax
python -m lic_tpu.cli.codec decompress /tmp/gh_ns.ltc /tmp/rec_ns.png \
    --weight_path /tmp/ns_init.npz --preset neural_syntax

python - <<'EOF'
import sys; sys.path.insert(0, ".")
from PIL import Image
im = Image.open("/tmp/rec_ns.png")
assert im.size == (512, 600), im.size   # original size restored (non-/64)
# truncation must fail loudly via the rANS final-state check
data = open("/tmp/gh_ns.ltc", "rb").read()
open("/tmp/gh_ns_trunc.ltc", "wb").write(data[:-40])
import subprocess
r = subprocess.run(
    [sys.executable, "-m", "lic_tpu.cli.codec", "decompress",
     "/tmp/gh_ns_trunc.ltc", "/tmp/rec_bad.png",
     "--weight_path", "/tmp/ns_init.npz", "--preset", "neural_syntax"],
    capture_output=True, text=True,
)
assert r.returncode != 0 and "corrupt or truncated" in (r.stderr + r.stdout), (
    r.returncode, r.stderr[-400:]
)
print("VERIFY-CLI-R4 OK: NS roundtrip (512x600), size restored, truncation caught")
EOF
