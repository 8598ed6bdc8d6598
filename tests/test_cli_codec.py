"""codec CLI: single-file and directory batch modes (plumbing-level —
the tiny config stands in for a preset via monkeypatch; byte/pixel
fidelity of the underlying coder is covered in test_compress/test_serving)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lic_tpu.config import CodecConfig
from lic_tpu.models import CodecModel


TINY = CodecConfig(
    family="charm", transform="plain", hyper="classic_dual",
    swatten=False, syntax="basic",
)


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    from lic_tpu.utils.checkpoint import save_params

    model = CodecModel(TINY)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), training=True,
    )
    path = tmp_path_factory.mktemp("w") / "tiny.npz"
    save_params(str(path), v["params"])
    return str(path)


@pytest.fixture()
def tiny_preset(monkeypatch):
    import lic_tpu.models as models

    monkeypatch.setattr(
        models, "build_model", lambda name, **kw: CodecModel(TINY)
    )


def _write_img(path, h, w, seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(path)


class TestCodecCLI:
    def test_single_file_roundtrip(self, tmp_path, weights, tiny_preset):
        from lic_tpu.cli.codec import main

        src = tmp_path / "img.png"
        _write_img(src, 64, 64, 0)
        main(["compress", str(src), str(tmp_path / "img.ltc"),
              "--weight_path", weights, "--preset", "tiny"])
        main(["decompress", str(tmp_path / "img.ltc"), str(tmp_path / "rec.png"),
              "--weight_path", weights, "--preset", "tiny"])
        from PIL import Image

        assert Image.open(tmp_path / "rec.png").size == (64, 64)

    def test_directory_batch_roundtrip(self, tmp_path, weights, tiny_preset):
        from lic_tpu.cli.codec import main

        src = tmp_path / "in"
        os.makedirs(src)
        _write_img(src / "a.png", 64, 64, 1)
        _write_img(src / "b.png", 64, 64, 2)   # same bucket as a
        _write_img(src / "c.png", 128, 64, 3)  # its own bucket
        main(["compress", str(src), str(tmp_path / "ltc"),
              "--weight_path", weights, "--preset", "tiny", "--batch", "2"])
        assert sorted(os.listdir(tmp_path / "ltc")) == [
            "a.ltc", "b.ltc", "c.ltc"
        ]
        main(["decompress", str(tmp_path / "ltc"), str(tmp_path / "out"),
              "--weight_path", weights, "--preset", "tiny", "--batch", "2"])
        from PIL import Image

        assert Image.open(tmp_path / "out" / "a.png").size == (64, 64)
        assert Image.open(tmp_path / "out" / "c.png").size == (64, 128)

        # batched bytes == single-file bytes for the same image
        main(["compress", str(src / "a.png"), str(tmp_path / "a_single.ltc"),
              "--weight_path", weights, "--preset", "tiny"])
        assert (
            (tmp_path / "a_single.ltc").read_bytes()
            == (tmp_path / "ltc" / "a.ltc").read_bytes()
        )
