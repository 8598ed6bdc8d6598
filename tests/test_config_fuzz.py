"""Interaction fuzz: real-bitstream roundtrips for config COMBINATIONS the
fixed preset matrix never exercises together (e.g. rbs synthesis + elic
hyper + gain units, post-processing + decodable U-Net hyper + bypassed
syntax conv).  Each case asserts the decoded image equals the eval-mode
forward — the same invariant as TestModelCompress, over fresh corners of
the config space."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel
from lic_tpu.models.compress import ChannelCoder

CASES = [
    # rbs g_s + ELIC hyper + 2 gain units + wam syntax, no LRP
    CodecConfig(
        family="charm", transform="rbs", hyper="elic",
        swatten=False, lrp=False, syntax="wam", gain_units=2,
    ),
    # decodable U-Net hyper + HAN post-processing + bypassed syntax conv
    CodecConfig(
        family="charm", transform="plain_wam", hyper="unet_dec",
        swatten=False, syntax="basic", syntax_decoder=False,
        tanh_after_syntax=False, post_processing=True,
    ),
    # rich transforms + classic-dual hyper + SWAtten + 4 gain units
    CodecConfig(
        family="charm", transform="rich", hyper="classic_dual",
        swatten=True, lrp=True, syntax="basic", gain_units=4,
    ),
]


@pytest.mark.parametrize("cfg", CASES, ids=lambda c: f"{c.transform}-{c.hyper}")
def test_roundtrip_matches_forward(cfg):
    model = CodecModel(cfg)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )["params"]
    coder = ChannelCoder(model, params)
    blob = coder.compress(x)
    assert len(blob) > 8
    rec = coder.decompress(blob)
    out = model.apply({"params": params}, x, training=False)
    np.testing.assert_allclose(
        np.asarray(rec), np.asarray(out.x_tilde), atol=1e-4
    )
