"""CodecService: dynamic batching must not change bytes or pixels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel
from lic_tpu.serving import CodecService


TINY = CodecConfig(
    family="charm", transform="plain", hyper="classic_dual",
    swatten=False, syntax="basic",
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CodecModel(TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, training=True,
    )
    return model, v["params"]


def _imgs(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.uniform(-1, 1, (h, w, 3)).astype(np.float32) for _ in range(n)]


class TestCodecService:
    def test_batched_roundtrip_matches_direct(self, model_and_params):
        model, params = model_and_params
        svc = CodecService(model, params, max_batch=4, max_wait_ms=20).start()
        try:
            imgs = _imgs(4, 64, 64)
            futs = [svc.submit_compress(im) for im in imgs]
            blobs = [f.result(timeout=600) for f in futs]

            # byte-identity vs the unbatched single-image path
            direct = svc.coder.compress(jnp.asarray(imgs[0][None]))
            assert blobs[0] == direct

            recs = [svc.submit_decompress(b).result(timeout=600) for b in blobs]
            ref = np.asarray(svc.coder.decompress(direct))[0]
            # decode symbols are identical (any σ divergence would trip the
            # stream integrity check); the service pads partial batches to
            # max_batch, so the final synthesize runs a different-batch
            # executable — pixel equality is fp32-level, not bit-level
            np.testing.assert_allclose(recs[0], ref, atol=1e-5)
            assert all(r.shape == (64, 64, 3) for r in recs)

            s = svc.stats.snapshot()
            assert s["requests"] >= 8 and s["batches"] >= 2
            assert s["errors"] == 0
            # the 4 same-size compresses should have shared batches
            assert s["mean_batch"] > 1.0
        finally:
            svc.stop()

    def test_per_request_rates_share_a_batch(self, model_and_params):
        """Variable-rate service: requests at different gain-unit rates
        batch together; each stream carries its own rate and decodes to
        the matching operating point (low rate → fewer bytes)."""
        model = CodecModel(TINY.replace(gain_units=4, gain_span=4.0))
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        v = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            x, training=True,
        )
        svc = CodecService(model, v["params"], max_batch=2, max_wait_ms=20).start()
        try:
            img = _imgs(1, 64, 64, seed=3)[0]
            futs = [
                svc.submit_compress(img, rate=0.0),
                svc.submit_compress(img, rate=3.0),
            ]
            lo, hi = (f.result(timeout=600) for f in futs)
            assert len(lo) < len(hi)
            for blob in (lo, hi):
                rec = svc.submit_decompress(blob).result(timeout=600)
                assert rec.shape == (64, 64, 3)
            assert svc.stats.snapshot()["errors"] == 0
        finally:
            svc.stop()

    def test_rate_on_gain_free_model_rejected(self, model_and_params):
        model, params = model_and_params
        svc = CodecService(model, params)
        with pytest.raises(ValueError, match="gain units"):
            svc.submit_compress(_imgs(1, 64, 64)[0], rate=1.0)

    def test_mixed_sizes_bucket_separately(self, model_and_params):
        model, params = model_and_params
        svc = CodecService(model, params, max_batch=4, max_wait_ms=5).start()
        try:
            a = svc.submit_compress(_imgs(1, 64, 64, seed=1)[0])
            b = svc.submit_compress(_imgs(1, 128, 64, seed=2)[0])
            blob_a, blob_b = a.result(timeout=600), b.result(timeout=600)
            ra = svc.submit_decompress(blob_a).result(timeout=600)
            rb = svc.submit_decompress(blob_b).result(timeout=600)
            assert ra.shape == (64, 64, 3) and rb.shape == (128, 64, 3)
        finally:
            svc.stop()

    def test_backpressure_and_stopped_errors(self, model_and_params):
        model, params = model_and_params
        svc = CodecService(model, params, max_batch=2, max_queue=1)
        # not started: queue fills and the second submit must be refused
        svc.submit_compress(_imgs(1, 64, 64)[0])
        with pytest.raises(RuntimeError, match="queue full"):
            svc.submit_compress(_imgs(1, 64, 64)[0])
        svc.start()
        svc.stop()
        with pytest.raises(RuntimeError, match="stopped"):
            svc.submit_compress(_imgs(1, 64, 64)[0])

    def test_bad_input_rejected(self, model_and_params):
        model, params = model_and_params
        svc = CodecService(model, params)
        with pytest.raises(ValueError, match="expected"):
            svc.submit_compress(np.zeros((64, 64), np.float32))
