"""Space-to-depth lowering of the 5×5/stride-2 analysis convs.

A k=5, s=2 conv runs at ~34 TF/s through XLA's strided path on v5e while
dense stride-1 convs reach ~80 TF/s.  Lowering through space-to-depth turns
the strided conv into a dense 3×3 conv over 4·C channels: output (m, n)
reads padded rows 2m..2m+4, i.e. 3 S2D cells × 2 phases, with the 5×5 taps
scattered into a (3, 3, 4·C_in, C_out) kernel (25 of 36 positions live —
1.44× MACs but at dense-conv efficiency, a net win on the MXU).

Exactness: bit-identical to the direct conv (same adds, same order per
output), tested in tests/test_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def s2d_kernel_from_5x5(kernel: jax.Array) -> jax.Array:
    """(5, 5, cin, cout) → (3, 3, 4·cin, cout) scattered kernel.

    Channel blocks follow space_to_depth layout: block (rh, rw) occupies
    channels [(rh·2 + rw)·cin, +cin).
    """
    k, _, cin, cout = kernel.shape
    assert k == 5
    # alignment: with the (2,2) outer pad replacing the reference (1,2),
    # tap a of the 5×5 lands on padded row 2m + a + 1 → cell m + (a+1)//2,
    # phase (a+1) % 2 (same for columns)
    out = jnp.zeros((3, 3, 4 * cin, cout), kernel.dtype)
    for a in range(5):
        jh, rh = (a + 1) // 2, (a + 1) % 2
        for b_ in range(5):
            jw, rw = (b_ + 1) // 2, (b_ + 1) % 2
            block = (rh * 2 + rw) * cin
            out = out.at[jh, jw, block : block + cin, :].set(kernel[a, b_])
    return out


def s2d_kernel_from_odd(kernel: jax.Array) -> jax.Array:
    """(k, k, cin, cout), k odd → (k', k', 4·cin, cout), k' = k//2+1.

    Generalizes :func:`s2d_kernel_from_5x5` to any odd k with the same
    (2,2)-outer-pad alignment (tap a → cell (a+1)//2, phase (a+1)%2)."""
    k, _, cin, cout = kernel.shape
    kp = k // 2 + 1
    out = jnp.zeros((kp, kp, 4 * cin, cout), kernel.dtype)
    for a in range(k):
        jh, rh = (a + 1) // 2, (a + 1) % 2
        for b_ in range(k):
            jw, rw = (b_ + 1) // 2, (b_ + 1) % 2
            block = (rh * 2 + rw) * cin
            out = out.at[jh, jw, block : block + cin, :].set(kernel[a, b_])
    return out


def conv_s2d_im2col(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Narrow-input stride-2 conv as s2d + contiguous-slice im2col + ONE dot.

    For C_in ≤ ~8 XLA's strided conv is MXU-starved (3 of 128 systolic
    rows) and the plain im2col's strided slices on a 3-lane tensor lower
    pathologically (scripts/perf_probe_r3.py).  This path: space-to-depth
    (one cheap transpose of a tiny tensor) → k' = k//2+1 CONTIGUOUS
    slices of the 4·C_in-channel grid, concatenated → a single
    (B·H'·W', k'²·4·C_in) × (k'²·4·C_in, C_out) matmul with a real K dim.

    Implements the reference's two stride-2 paddings: k=5 with
    ZeroPad2d((1,2,1,2)) and k=3 with padding=1 — both align on the same
    (2,2)-outer-pad s2d grid.  Bit-parity with the direct conv is tested.
    """
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    cout = kernel.shape[-1]
    assert k % 2 == 1 and h % 2 == 0 and w % 2 == 0
    kp = k // 2 + 1
    ho, wo = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    hp, wp = h + 4, w + 4
    xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * cin)
    cols = jnp.concatenate(
        [
            jax.lax.slice(
                xs, (0, jh, jw, 0), (b, jh + ho, jw + wo, 4 * cin)
            )
            for jh in range(kp)
            for jw in range(kp)
        ],
        axis=-1,
    )
    ks = s2d_kernel_from_odd(kernel).reshape(kp * kp * 4 * cin, cout)
    y = jax.lax.dot_general(
        cols.reshape(b * ho * wo, kp * kp * 4 * cin),
        ks,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.reshape(b, ho, wo, cout).astype(x.dtype)


def conv5s2_s2d(
    x: jax.Array,
    kernel: jax.Array,  # (5, 5, cin, cout)
    pad: tuple = (1, 2, 1, 2),  # torch ZeroPad2d order (l, r, t, b)
) -> jax.Array:
    """Equivalent of ZeroPad2d(pad) + Conv2d(k=5, s=2) via S2D + dense 3×3.

    Requires the padded size to be even (true for the codec's even inputs
    with the reference (1,2,1,2) padding → handled by widening the pad to
    (2,2,2,2) and shifting the kernel alignment, which is what the tap
    scatter above assumes)."""
    left, right, top, bottom = pad
    b, h, w, cin = x.shape
    # align to even grid: shift so the first output's window starts at
    # padded row 0 → need pad_top' = 2 with taps scattered as derived
    assert (top, left) == (1, 1) and (bottom, right) == (2, 2), (
        "s2d path implements the reference down-padding (1,2,1,2)"
    )
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    hp, wp = h + 4, w + 4
    assert hp % 2 == 0 and wp % 2 == 0
    xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, cin)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * cin)
    ks = s2d_kernel_from_5x5(kernel)
    return lax.conv_general_dilated(
        xs, ks, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
