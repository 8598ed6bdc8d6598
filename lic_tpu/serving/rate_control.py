"""Target-bitrate rate control over variable-rate (gain-unit) checkpoints.

Beyond-reference serving capability.  The reference pins one λ per
checkpoint (``train_net_unet.py:273-275``) — hitting a bitrate budget
means re-encoding against several checkpoints.  A gain-unit model
(``CodecConfig.gain_units``) spans a continuous rate family from one
checkpoint, and its bpp is monotone in the continuous rate index (the
log-spaced gain-ramp init + exponential gain interpolation,
``models/codec.py`` gain-unit block), so a target bpp is solvable by
bisection on the ESTIMATED bpp — a likelihood forward per probe, no
entropy coding — in ~8 jitted forwards that all share one compiled
executable (the rate is a traced scalar).

``solve_rate_for_bpp`` returns the continuous rate index; feed it to
``ChannelCoder.compress(x, rate=...)`` (the rate rides the bitstream
header, so any decoder of the same checkpoint applies the matching
inverse gain).  The estimate tracks the real bitstream within the
likelihood-vs-rANS gap measured elsewhere (~1-3%% at trained operating
points, ``rd_runs/*/eval.json`` estimated-vs-real columns).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..data.pad import pad_to_multiple

__all__ = ["solve_rate_for_bpp"]


@functools.lru_cache(maxsize=8)
def _bpp_forward(model):
    @jax.jit
    def f(params, x, rate):
        return model.apply(
            {"params": params}, x, training=False, rate=rate
        ).bpp

    return f


def solve_rate_for_bpp(
    model,
    params,
    x: jax.Array,
    target_bpp: float,
    *,
    tol: float = 0.02,
    max_iters: int = 8,
) -> Tuple[float, float]:
    """Find the continuous gain-unit rate whose estimated bpp hits
    ``target_bpp`` on THIS image.

    x: (1, H, W, 3) in [−1, 1], any size (padded internally; the bpp is
    renormalized to true pixels like ``evaluation.evaluate_image``).

    Returns ``(rate, est_bpp)``.  Targets outside the checkpoint's span
    clamp to the nearest endpoint (rate 0 or K−1) — callers can compare
    ``est_bpp`` against ``target_bpp`` to detect the clamp.

    ``tol`` is relative: stop when |est − target| ≤ tol·target.
    """
    K = int(model.cfg.gain_units)
    if K < 2:
        raise ValueError(
            "target-bpp rate control needs a variable-rate checkpoint "
            f"(cfg.gain_units >= 2, got {K}) — e.g. the source_net_vr preset"
        )
    if target_bpp <= 0:
        raise ValueError(f"target_bpp must be positive, got {target_bpp}")
    if x.ndim != 4 or x.shape[0] != 1:
        raise ValueError(f"expected one (1, H, W, 3) image, got {x.shape}")

    padded, (h, w) = pad_to_multiple(x)
    # model bpp is normalized by padded pixels; report per true pixel
    scale = (padded.shape[1] * padded.shape[2]) / (h * w)
    fwd = _bpp_forward(model)

    def est(rate: float) -> float:
        return float(fwd(params, padded, jnp.float32(rate))) * scale

    lo, hi = 0.0, float(K - 1)
    b_lo, b_hi = est(lo), est(hi)
    if target_bpp <= b_lo:
        return lo, b_lo
    if target_bpp >= b_hi:
        return hi, b_hi

    mid, b_mid = lo, b_lo
    for _ in range(max_iters):
        mid = 0.5 * (lo + hi)
        b_mid = est(mid)
        if abs(b_mid - target_bpp) <= tol * target_bpp:
            break
        if b_mid < target_bpp:
            lo = mid
        else:
            hi = mid
    return mid, b_mid
