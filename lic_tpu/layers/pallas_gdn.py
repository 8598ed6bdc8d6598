"""Fused GDN/IGDN Pallas TPU kernel.

GDN in NHWC is ``y = x · (x²Γᵀ + β)^∓½`` — a square, a channel matmul, and
an elementwise epilogue.  XLA must materialize ``x²`` as a dot operand (dot
operands aren't fused), so the stock lowering moves ~4 tensor-sized HBM
transfers; this kernel reads ``x`` once, keeps ``x²``/norm in VMEM, and
writes ``y`` once — the op is bandwidth-bound, so that is ~2× for the GDN
stages.

Forward runs as a Pallas kernel; the backward pass (training) uses the
closed-form VJP in plain jnp (it is matmul-shaped and MXU-bound anyway):

    n   = x²Γᵀ + β
    y   = x·n^{-1/2}                        (inverse=False)
    t_o = -½·g_o·x_o·n_o^{-3/2}
    dx  = g·n^{-1/2} + 2x·(tΓ)
    dΓ  = tᵀ(x²)   (per output channel o over input channel i)
    dβ  = Σ_rows t
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gdn_kernel(x_ref, gamma_t_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    xsq = x * x
    norm = (
        jnp.dot(xsq, gamma_t_ref[:], preferred_element_type=jnp.float32)
        + beta_ref[:]
    )
    if inverse:
        out_ref[:] = (x * jnp.sqrt(norm)).astype(out_ref.dtype)
    else:
        out_ref[:] = (x * jax.lax.rsqrt(norm)).astype(out_ref.dtype)


def _gdn_fwd_pallas(x2d, gamma_t, beta, inverse, interpret=False):
    rows, c = x2d.shape
    tile = 512 if rows >= 512 else rows
    grid = (pl.cdiv(rows, tile),)
    return pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x2d, gamma_t, beta[None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gdn_fused(x, gamma, beta, inverse: bool = False, interpret: bool = False):
    """x: (..., C); gamma: (C_out, C_in) reference orientation; beta: (C,)."""
    shape = x.shape
    c = shape[-1]
    y = _gdn_fwd_pallas(
        x.reshape(-1, c), gamma.T, beta, inverse, interpret=interpret
    )
    return y.reshape(shape)


def _gdn_fused_fwd(x, gamma, beta, inverse, interpret):
    y = gdn_fused(x, gamma, beta, inverse, interpret)
    return y, (x, gamma, beta)


def _gdn_fused_bwd(inverse, interpret, res, g):
    x, gamma, beta = res
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    g2 = g.reshape(-1, c)
    # fp32 accumulation to MATCH the forward kernel (which computes the
    # norm via preferred_element_type=fp32 + fp32 rsqrt): a bf16-rounded n
    # feeds n^{-3/2}-sensitive terms and diverges cubically near beta_min
    xsq = (x2 * x2).astype(jnp.float32)
    g2 = g2.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    n = (
        jnp.dot(xsq, gamma.T.astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + beta.astype(jnp.float32)
    )
    if inverse:
        sq = jnp.sqrt(n)
        # y = x·n^{1/2}; t_o = ½ g_o x_o n^{-1/2}
        t = 0.5 * g2 * x2 / sq
        dx = g2 * sq + 2.0 * x2 * (t @ gamma.astype(jnp.float32))
    else:
        rsq = jax.lax.rsqrt(n)
        t = -0.5 * g2 * x2 * rsq / n
        dx = g2 * rsq + 2.0 * x2 * (t @ gamma.astype(jnp.float32))
    dgamma = (t.T @ xsq).astype(gamma.dtype)
    dbeta = jnp.sum(t, axis=0).astype(beta.dtype)
    return dx.reshape(shape).astype(x.dtype), dgamma, dbeta


gdn_fused.defvjp(_gdn_fused_fwd, _gdn_fused_bwd)
