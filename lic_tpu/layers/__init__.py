"""Neural building blocks (L2 of the reference layer map), NHWC / flax.linen.

Everything here is a TPU-first re-design of the reference's layer zoo
(``/root/reference/layers/``, ``model/gdn.py``, ``model/Block_unet.py``,
``model/attention.py``) — same math, idiomatic XLA.
"""

from .conv import (
    Conv2d,
    ConvTranspose2d,
    SubpelConv2d,
    conv1x1,
    conv3x3,
    conv5x5,
    conv7x7,
)
from .gdn import GDN, IGDN, GDN1
from .blocks import (
    ResidualUnit,
    ResidualBlock,
    ResidualBlockWithStride,
    ResidualBlockUpsample,
    ResidualBottleneck,
    ResidualBlock3x3,
    ResidualBlock3_5,
    ResidualBlock5x5,
    AttentionBlock,
)
from .win_attention import (
    window_partition,
    window_reverse,
    WindowAttention,
    WinBasedAttention,
    WinNoShiftAttention,
)
from .swin import WMSA, SwinTransformerBlock, SwinBlock, SWAtten
from .spatial_transformer import (
    GEGLU,
    FeedForward,
    CrossAttention,
    BasicTransformerBlock,
    SpatialTransformer,
)

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "SubpelConv2d",
    "conv1x1",
    "conv3x3",
    "conv5x5",
    "conv7x7",
    "GDN",
    "IGDN",
    "GDN1",
    "ResidualUnit",
    "ResidualBlock",
    "ResidualBlockWithStride",
    "ResidualBlockUpsample",
    "ResidualBottleneck",
    "ResidualBlock3x3",
    "ResidualBlock3_5",
    "ResidualBlock5x5",
    "AttentionBlock",
    "window_partition",
    "window_reverse",
    "WindowAttention",
    "WinBasedAttention",
    "WinNoShiftAttention",
    "WMSA",
    "SwinTransformerBlock",
    "SwinBlock",
    "SWAtten",
    "GEGLU",
    "FeedForward",
    "CrossAttention",
    "BasicTransformerBlock",
    "SpatialTransformer",
]
