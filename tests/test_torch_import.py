"""Full-model forward parity vs the ACTUAL reference code.

Loads the unmodified ``/root/reference/model/source_net_WAM.py`` under
torch-cpu (missing modules + absent deps shimmed — tools/import_torch.py),
imports its randomly initialized state dict into lic_tpu's
``source_net_wam`` preset, and asserts the two frameworks agree on a fixed
input:

* analysis latent ``z3`` elementwise (NCHW↔NHWC),
* the reconstruction-driven ``mse`` and the y-stream ``bpp`` scalars
  (the reference counts only y bits — ``source_net_WAM.py:963``).

This upgrades the per-op/per-layer torch restatement tests to end-to-end
equivalence against the reference's own forward.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = os.environ.get("LIC_TPU_REFERENCE", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "model")),
    reason="reference tree not available",
)


@pytest.fixture(scope="module")
def pair():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_torch import import_source_net_wam, load_reference_net

    import jax
    import jax.numpy as jnp

    from lic_tpu.models import build_model

    net = load_reference_net(train_size=(1, 64, 64, 3))
    net.eval()

    model = build_model("source_net_wam")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = jax.eval_shape(
        lambda k: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, x, training=True
        ),
        jax.random.PRNGKey(0),
    )["params"]
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), template)
    params = import_source_net_wam(net.state_dict(), template, verbose=False)
    return net, model, params


def _fixed_input():
    rng = np.random.default_rng(42)
    return rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)


class TestForwardParity:
    def test_analysis_latent_matches(self, pair):
        import jax

        net, model, params = pair
        x = _fixed_input()
        with torch.no_grad():
            z3_t = net.a_model(torch.from_numpy(x).permute(0, 3, 1, 2))
        z3_j = model.apply(
            {"params": params}, jax.numpy.asarray(x), method="analyze"
        )
        z3_t = z3_t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(z3_j), z3_t, atol=2e-4, rtol=2e-4
        )

    def test_bpp_and_mse_match(self, pair):
        import jax

        net, model, params = pair
        x = _fixed_input()
        with torch.no_grad():
            bpp_t, mse_t = net(
                torch.from_numpy(x).permute(0, 3, 1, 2), "train"
            )
        out = model.apply(
            {"params": params}, jax.numpy.asarray(x), training=False
        )
        # the reference counts only the y stream (defect §8.7); compare
        # against our bpp_y component
        np.testing.assert_allclose(
            float(out.bpp_y), float(bpp_t), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            float(out.mse), float(mse_t), rtol=2e-3, atol=2e-5
        )


@pytest.fixture(scope="module")
def pair_net_ga():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from import_torch import import_net_ga, load_reference_net

    import jax
    import jax.numpy as jnp

    from lic_tpu.models import build_model

    # net_ga's Syntax_Model applies a ws=4 WAM two /2 stages below the
    # /16 latent (net_ga.py:622-650) — inputs below 256px make that grid
    # 2x2 and the reference's own window_partition view fails; 256 is the
    # smallest reference-runnable size (its real train_size).
    net = load_reference_net(train_size=(1, 256, 256, 3), module="model.net_ga")
    net.eval()

    model = build_model("net_ga")
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    template = jax.eval_shape(
        lambda k: model.init(
            {"params": k, "noise": jax.random.PRNGKey(1)}, x, training=True
        ),
        jax.random.PRNGKey(0),
    )["params"]
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), template)
    params = import_net_ga(net.state_dict(), template, verbose=False)
    return net, model, params


def _fixed_input_256():
    rng = np.random.default_rng(43)
    return rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32)


class TestNetGaForwardParity:
    """End-to-end parity vs the reference's EVAL entry model
    (``eval_net.py:16`` → ``model/net_ga.py``): rich transforms, ELIC
    hyper with subpel heads, SWAtten slice stacks, syntax tail."""

    def test_analysis_latent_matches(self, pair_net_ga):
        import jax

        net, model, params = pair_net_ga
        x = _fixed_input_256()
        with torch.no_grad():
            z3_t = net.a_model(torch.from_numpy(x).permute(0, 3, 1, 2))
        z3_j = model.apply(
            {"params": params}, jax.numpy.asarray(x), method="analyze"
        )
        z3_t = z3_t.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(
            np.asarray(z3_j), z3_t, atol=5e-4, rtol=5e-4
        )

    def test_bpp_and_mse_match(self, pair_net_ga):
        import jax

        net, model, params = pair_net_ga
        x = _fixed_input_256()
        with torch.no_grad():
            bpp_t, mse_t = net(
                torch.from_numpy(x).permute(0, 3, 1, 2), "train"
            )
        out = model.apply(
            {"params": params}, jax.numpy.asarray(x), training=False
        )
        # net_ga counts only the y stream (same §8.7 shape as source_net)
        np.testing.assert_allclose(
            float(out.bpp_y), float(bpp_t), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            float(out.mse), float(mse_t), rtol=2e-3, atol=2e-5
        )


class TestPostProcessingParity:
    """source_net_WAM with the HAN post-processing tail: full-forward
    parity incl. HAN, LAM/CSAM, the generated 1x1, and the mean shift.

    The reference re-randomizes its frozen MeanShift convs through
    ``weight_init`` (defect register); lic_tpu applies the fixed DIV2K
    shift the construction intends, so the torch side's sub/add_mean are
    reset to the canonical values before comparing."""

    def test_bpp_and_mse_match_with_han(self):
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "tools")
        )
        from import_torch import import_source_net_wam, load_reference_net

        import jax
        import jax.numpy as jnp

        from lic_tpu.models import build_model

        net = load_reference_net(
            train_size=(1, 64, 64, 3), post_processing=True
        )
        net.eval()
        with torch.no_grad():
            mean = torch.tensor([0.4488, 0.4371, 0.4040])
            for m, sign in ((net.HAN.sub_mean, -1), (net.add_mean, 1)):
                m.weight.copy_(torch.eye(3).view(3, 3, 1, 1))
                m.bias.copy_(sign * mean)

        model = build_model("source_net_wam", post_processing=True)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        template = jax.eval_shape(
            lambda k: model.init(
                {"params": k, "noise": jax.random.PRNGKey(1)},
                x0, training=True,
            ),
            jax.random.PRNGKey(0),
        )["params"]
        template = jax.tree.map(
            lambda s: np.zeros(s.shape, np.float32), template
        )
        params = import_source_net_wam(
            net.state_dict(), template, post_processing=True, verbose=False
        )

        x = _fixed_input()
        with torch.no_grad():
            bpp_t, mse_t = net(
                torch.from_numpy(x).permute(0, 3, 1, 2), "train"
            )
        out = model.apply(
            {"params": params}, jax.numpy.asarray(x), training=False,
            use_post_processing=True,
        )
        np.testing.assert_allclose(
            float(out.bpp_y), float(bpp_t), rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(
            float(out.mse), float(mse_t), rtol=5e-3, atol=5e-5
        )
