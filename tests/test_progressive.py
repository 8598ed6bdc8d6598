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

    def test_gaussian_and_static_digit_models_agree(self, setup):
        """Both digit models reconstruct identically at full rate; streams
        carry a format byte so a mismatched coder rejects loudly.  (The
        gaussian model's rate win only exists when the model's σ matches
        the residual statistics, i.e. on trained checkpoints — the coder-
        level win is asserted in test_gaussian_trit_rate below.)"""
        m, params, x, coder, blob = setup
        static = ProgressiveCoder(m, params, name="tiny", digit_model="static")
        blob_s = static.compress(x)
        np.testing.assert_allclose(
            np.asarray(coder.decompress(blob)),
            np.asarray(static.decompress(blob_s)),
            atol=1e-6,
        )
        with pytest.raises(ValueError, match="digit model"):
            static.decompress(blob)


def test_gaussian_trit_rate_and_roundtrip():
    """On residuals actually distributed N(0, σ) with per-element σ (the
    trained-model regime), the σ-modeled digit coder must beat the static
    per-plane tables and land near the per-element Gaussian entropy;
    every truncation prefix must decode; full decode must be exact."""
    from lic_tpu.coding.tritplane import (
        GaussianTritCoder,
        TritPlaneCoder,
        num_planes_for,
    )

    rng = np.random.default_rng(3)
    n = 20000
    sigma = np.exp(rng.uniform(np.log(0.05), np.log(8.0), n))
    r = np.round(rng.standard_normal(n) * sigma).astype(np.int64)
    k = num_planes_for(int(np.abs(r).max(initial=1)))
    g = GaussianTritCoder()
    t = TritPlaneCoder()
    gb = g.encode(r, sigma, k)
    tb = t.encode(r, k)
    assert np.array_equal(g.decode(gb, n, sigma, k), r)
    for planes in range(k):
        dec = g.decode(gb[:planes], n, sigma, k)
        # midpoint fill: error bounded by the undecoded span
        assert np.abs(dec - r).max() <= (3 ** (k - planes) - 1) // 2
    assert sum(map(len, gb)) < sum(map(len, tb))
