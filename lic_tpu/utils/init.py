"""Initializer helpers (capability of ``model/util.py:175-283``): xavier /
kaiming / truncated-normal / ViT-style initializers as flax initializers."""

from __future__ import annotations

from flax import linen as nn

xavier_uniform = nn.initializers.xavier_uniform
xavier_normal = nn.initializers.xavier_normal
kaiming_normal = nn.initializers.kaiming_normal


def trunc_normal(std: float = 0.02):
    """timm-style truncated normal (``_no_grad_trunc_normal_``)."""
    return nn.initializers.truncated_normal(stddev=std)


def vit2_init(std: float = 0.02):
    """ViT linear/embedding init used for the transformer hyper modules
    (``model/util.py`` ``vit2_init``)."""
    return nn.initializers.truncated_normal(stddev=std)
