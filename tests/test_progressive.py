"""Progressive trit-plane bitstream tests (lic_tpu.models.progressive).

Reference capability: ``model/Trit_Plane.py:25-95`` (standalone trit/rank
script) — realized here as a scalable multi-rate bitstream over a trained
ChARM model (BASELINE config #5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel
from lic_tpu.models.progressive import ProgressiveCoder

TINY = CodecConfig(
    family="charm", transform="plain", hyper="classic_dual",
    swatten=False, syntax="basic",
)


@pytest.fixture(scope="module")
def setup():
    m = CodecModel(TINY)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    params = m.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )["params"]
    coder = ProgressiveCoder(m, params, name="tiny")
    blob = coder.compress(x)
    return m, params, x, coder, blob


class TestProgressiveStream:
    def test_every_truncation_point_decodes(self, setup):
        _, _, x, coder, blob = setup
        pts = coder.truncation_points(blob)
        assert pts[-1][0] >= 2, "stream should carry at least 2 planes"
        assert pts[-1][1] == len(blob)
        for n, _bytes in pts:
            rec = coder.decompress(blob, max_planes=n)
            assert rec.shape == x.shape
            assert bool(jnp.all(jnp.isfinite(rec)))

    def test_full_decode_matches_eval_forward(self, setup):
        m, params, x, coder, blob = setup
        ref = m.apply({"params": params}, x, training=False)
        full = coder.decompress(blob)
        # different jit programs — fp32 tolerance, not bit-exactness
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(ref.x_tilde), atol=5e-3
        )

    def test_more_planes_not_worse(self, setup):
        _, _, x, coder, blob = setup
        pts = coder.truncation_points(blob)
        mse_none = float(jnp.mean((coder.decompress(blob, 0) - x) ** 2))
        mse_full = float(jnp.mean((coder.decompress(blob) - x) ** 2))
        # per-plane midpoint fill guarantees the full stream is at least
        # as accurate IN THE LATENT; reconstruction follows at fp32 slack
        assert mse_full <= mse_none * 1.01, (pts, mse_none, mse_full)

    def test_bad_magic_rejected(self, setup):
        _, _, _, coder, blob = setup
        with pytest.raises(ValueError, match="magic"):
            coder.decompress(b"XXXX" + blob[4:])

    def test_rejects_non_decodable_hyper(self):
        cfg = TINY.replace(hyper="unet")
        m = CodecModel(cfg)
        with pytest.raises(ValueError, match="not decodable"):
            ProgressiveCoder(m, {}, name="x")
