"""TPU probe: isolate which Mosaic primitive the rANS drain kernel uses
mis-executes on real hardware.

Two structurally different drain kernels (mixed-layout and flattened-lane)
produced the SAME wrong values on v5e while interpret mode is bit-exact
(chain7.log 2026-08-19 17:06 / 17:23: decoded 6 vs 54 at symbol (0,1) in
both).  This probe runs each suspect primitive in a minimal pallas kernel
and compares against numpy:

  P1  dynamic leading-dim read of a (mc, 1, N) VMEM ref inside fori_loop
  P2  dim-0 int32 iota (K, N)
  P3  one-hot compare (dim-0 iota == (1,N) row) + sublane reduce
  P4  matmul (K, M)@(M, N) vs M=1 matmul (1, M)@(M, N)
  P5  broadcast_to((1,M) -> (8,M)) then matmul, row 0
  P6  the full row-lookup pipeline at drain shapes (table matmul + le-sum
      slot + one-hot start/nxt selects) on ONE chunk, vs numpy
  P7  VMEM scratch read-modify-write across fori_loop iterations
  P8  SMEM scalar loop-carried pointer arithmetic

Prints PASS/FAIL per primitive with first-mismatch details; always exits
0 so the queue continues.  Run via the rd_runs queue (serial TPU).
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.default_backend() != "tpu"
    print(f"backend: {jax.default_backend()} interpret={interp}")
    rng = np.random.default_rng(0)
    results = []

    def check(name, got, want):
        got = np.asarray(got)
        want = np.asarray(want)
        ok = got.shape == want.shape and np.array_equal(got, want)
        if ok:
            print(f"  {name}: PASS")
        else:
            d = got != want
            idx = np.argwhere(d)
            i0 = tuple(idx[0]) if idx.size else None
            print(
                f"  {name}: FAIL ndiff={int(d.sum())}/{d.size} first at "
                f"{i0}: got={got[i0] if i0 else '?'} want={want[i0] if i0 else '?'}"
            )
        results.append((name, ok))

    def pcall(*a, **kw):
        return pl.pallas_call(*a, interpret=interp, **kw)

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    # ---- P1: dynamic leading-dim read inside fori_loop -----------------
    mc, N = 5, 256
    rows_np = rng.integers(0, 64, (mc, 1, N)).astype(np.int32)

    def k1(rows_ref, out_ref):
        def body(i, _):
            out_ref[i] = rows_ref[i] * 2
            return 0
        jax.lax.fori_loop(0, mc, body, 0)

    try:
        out = pcall(
            k1, out_shape=jax.ShapeDtypeStruct((mc, 1, N), jnp.int32),
            in_specs=[vmem()], out_specs=vmem(),
        )(jnp.asarray(rows_np))
        check("P1 dyn leading-dim read", out, rows_np * 2)
    except Exception as e:
        print(f"  P1: ERROR {type(e).__name__}: {e}")
        results.append(("P1", False))

    # ---- P2: dim-0 iota -------------------------------------------------
    K = 64

    def k2(out_ref):
        out_ref[...] = jax.lax.broadcasted_iota(jnp.int32, (K, N), 0)

    try:
        out = pcall(
            k2, out_shape=jax.ShapeDtypeStruct((K, N), jnp.int32),
            in_specs=[], out_specs=vmem(),
        )()
        check("P2 dim-0 iota", out, np.broadcast_to(
            np.arange(K, dtype=np.int32)[:, None], (K, N)))
    except Exception as e:
        print(f"  P2: ERROR {type(e).__name__}: {e}")
        results.append(("P2", False))

    # ---- P3: one-hot compare + sublane reduce ---------------------------
    rows1 = rng.integers(0, K, (1, N)).astype(np.int32)
    vals_col = rng.integers(0, 1000, (K, 1)).astype(np.float32)

    def k3(r_ref, v_ref, out_ref):
        ri = jax.lax.broadcasted_iota(jnp.int32, (K, N), 0)
        oh = (ri == r_ref[...]).astype(jnp.float32)
        out_ref[...] = jnp.sum(v_ref[...] * oh, axis=0, keepdims=True)

    try:
        out = pcall(
            k3, out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[vmem(), vmem()], out_specs=vmem(),
        )(jnp.asarray(rows1), jnp.asarray(vals_col))
        check("P3 one-hot + reduce", out, vals_col[rows1[0]].T)
    except Exception as e:
        print(f"  P3: ERROR {type(e).__name__}: {e}")
        results.append(("P3", False))

    # ---- P4: matmul vs M=1 matmul ---------------------------------------
    M = 64
    a8 = rng.integers(0, 9, (8, M)).astype(np.float32)
    bmat = rng.integers(0, 9, (M, N)).astype(np.float32)

    def k4a(a_ref, b_ref, out_ref):
        out_ref[...] = jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

    try:
        out = pcall(
            k4a, out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            in_specs=[vmem(), vmem()], out_specs=vmem(),
        )(jnp.asarray(a8), jnp.asarray(bmat))
        check("P4a (8,M)@(M,N)", out, a8 @ bmat)
    except Exception as e:
        print(f"  P4a: ERROR {type(e).__name__}: {e}")
        results.append(("P4a", False))

    a1 = a8[:1]

    def k4b(a_ref, b_ref, out_ref):
        out_ref[...] = jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32)

    try:
        out = pcall(
            k4b, out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[vmem(), vmem()], out_specs=vmem(),
        )(jnp.asarray(a1), jnp.asarray(bmat))
        check("P4b (1,M)@(M,N)", out, a1 @ bmat)
    except Exception as e:
        print(f"  P4b: ERROR {type(e).__name__}: {e}")
        results.append(("P4b", False))

    # ---- P5: broadcast-to-8 matmul, slice row 0 --------------------------
    def k5(a_ref, b_ref, out_ref):
        a = jnp.broadcast_to(a_ref[...], (8, M))
        out_ref[...] = jnp.dot(
            a, b_ref[...], preferred_element_type=jnp.float32)[0:1]

    try:
        out = pcall(
            k5, out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[vmem(), vmem()], out_specs=vmem(),
        )(jnp.asarray(a1), jnp.asarray(bmat))
        check("P5 bcast8 matmul row0", out, a1 @ bmat)
    except Exception as e:
        print(f"  P5: ERROR {type(e).__name__}: {e}")
        results.append(("P5", False))

    # ---- P6: full row-lookup pipeline, one chunk, drain shapes ----------
    from lic_tpu.coding.codec import GaussianCoder

    g = GaussianCoder()
    cdfs = g.codec.cdfs.astype(np.int64)     # (nrows, row_len)
    offsets = g.codec.offsets.astype(np.int32)
    nrows, row_len = cdfs.shape
    nsyms = row_len - 2
    BL = 1024
    rows_c = rng.integers(0, nrows, (1, BL)).astype(np.int32)
    cum_c = rng.integers(0, 1 << 16, (1, BL)).astype(np.int32)
    cdf_t = cdfs.astype(np.float32).T        # (row_len, nrows)
    off_col = offsets.astype(np.float32).reshape(-1, 1)

    def k6(rows_ref, cum_ref, cdf_ref, off_ref, slot_ref, off_o_ref,
           start_ref, nxt_ref):
        ri = jax.lax.broadcasted_iota(jnp.int32, (nrows, BL), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (row_len, BL), 0)
        oh = (ri == rows_ref[...]).astype(jnp.float32)
        row_f = jnp.dot(
            cdf_ref[...], oh, preferred_element_type=jnp.float32)
        off = jnp.sum(off_ref[...] * oh, axis=0, keepdims=True)
        le = (row_f <= cum_ref[...].astype(jnp.float32)).astype(jnp.float32)
        slot = (jnp.sum(le, axis=0, keepdims=True) - 1.0).astype(jnp.int32)
        slot = jnp.minimum(slot, nsyms)
        oh_s = (li == slot).astype(jnp.float32)
        start = jnp.sum(row_f * oh_s, axis=0, keepdims=True)
        oh_n = (li == slot + 1).astype(jnp.float32)
        nxt = jnp.sum(row_f * oh_n, axis=0, keepdims=True)
        slot_ref[...] = slot
        off_o_ref[...] = off.astype(jnp.int32)
        start_ref[...] = start.astype(jnp.int32)
        nxt_ref[...] = nxt.astype(jnp.int32)

    # numpy reference
    rf = cdfs[rows_c[0]]                      # (BL, row_len)
    slot_np = np.minimum(
        (rf <= cum_c[0][:, None]).sum(-1).astype(np.int32) - 1, nsyms)
    off_np = offsets[rows_c[0]]
    start_np = rf[np.arange(BL), slot_np].astype(np.int32)
    nxt_np = rf[np.arange(BL), np.minimum(slot_np + 1, row_len - 1)].astype(
        np.int32)

    try:
        slot_o, off_o, start_o, nxt_o = pcall(
            k6,
            out_shape=(
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
            ),
            in_specs=[vmem()] * 4,
            out_specs=(vmem(),) * 4,
        )(jnp.asarray(rows_c), jnp.asarray(cum_c), jnp.asarray(cdf_t),
          jnp.asarray(off_col))
        check("P6 slot", slot_o[0], slot_np)
        check("P6 off", off_o[0], off_np)
        check("P6 start", start_o[0], start_np)
        check("P6 nxt", nxt_o[0], nxt_np)
    except Exception as e:
        print(f"  P6: ERROR {type(e).__name__}: {e}")
        results.append(("P6", False))

    # ---- P6s: same pipeline, byte-split matmuls (the fix) ----------------
    # P6's failure values are bf16-ROUNDED table entries (61400 -> 61440):
    # the MXU runs f32 matmuls as bf16 passes at default precision.  Split
    # the 16-bit table into bf16-exact byte planes, two matmuls, recombine.
    cdf_hi = (cdfs >> 8).astype(np.float32).T
    cdf_lo = (cdfs & 255).astype(np.float32).T

    def k6s(rows_ref, cum_ref, hi_ref, lo_ref, slot_ref, start_ref,
            nxt_ref):
        ri = jax.lax.broadcasted_iota(jnp.int32, (nrows, BL), 0)
        li = jax.lax.broadcasted_iota(jnp.int32, (row_len, BL), 0)
        oh = (ri == rows_ref[...]).astype(jnp.float32)
        row_f = 256.0 * jnp.dot(
            hi_ref[...], oh, preferred_element_type=jnp.float32
        ) + jnp.dot(lo_ref[...], oh, preferred_element_type=jnp.float32)
        le = (row_f <= cum_ref[...].astype(jnp.float32)).astype(jnp.float32)
        slot = (jnp.sum(le, axis=0, keepdims=True) - 1.0).astype(jnp.int32)
        slot = jnp.minimum(slot, nsyms)
        oh_s = (li == slot).astype(jnp.float32)
        start = jnp.sum(row_f * oh_s, axis=0, keepdims=True)
        oh_n = (li == slot + 1).astype(jnp.float32)
        nxt = jnp.sum(row_f * oh_n, axis=0, keepdims=True)
        slot_ref[...] = slot
        start_ref[...] = start.astype(jnp.int32)
        nxt_ref[...] = nxt.astype(jnp.int32)

    try:
        slot_o, start_o, nxt_o = pcall(
            k6s,
            out_shape=(
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
                jax.ShapeDtypeStruct((1, BL), jnp.int32),
            ),
            in_specs=[vmem()] * 4,
            out_specs=(vmem(),) * 3,
        )(jnp.asarray(rows_c), jnp.asarray(cum_c), jnp.asarray(cdf_hi),
          jnp.asarray(cdf_lo))
        check("P6s slot (byte-split)", slot_o[0], slot_np)
        check("P6s start (byte-split)", start_o[0], start_np)
        check("P6s nxt (byte-split)", nxt_o[0], nxt_np)
    except Exception as e:
        print(f"  P6s: ERROR {type(e).__name__}: {e}")
        results.append(("P6s", False))

    # ---- P7: VMEM scratch RMW across fori_loop ---------------------------
    def k7(out_ref, acc):
        acc[...] = jnp.zeros((1, N), jnp.int32)

        def body(i, _):
            acc[...] = acc[...] * 3 + i
            return 0
        jax.lax.fori_loop(0, 4, body, 0)
        out_ref[...] = acc[...]

    try:
        out = pcall(
            k7, out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
            in_specs=[], out_specs=vmem(),
            scratch_shapes=[pltpu.VMEM((1, N), jnp.int32)],
        )()
        want = np.full((1, N), ((0 * 3 + 1) * 3 + 2) * 3 + 3, np.int32)
        check("P7 scratch RMW loop", out, want)
    except Exception as e:
        print(f"  P7: ERROR {type(e).__name__}: {e}")
        results.append(("P7", False))

    # ---- P8: SMEM scalar loop-carried pointer ----------------------------
    B = 4

    def k8(p_in, out_ref, p_out, p_s):
        for b in range(B):
            p_s[b] = p_in[b]

        def body(i, _):
            for b in range(B):
                p_s[b] = p_s[b] + b + 1
            return 0
        jax.lax.fori_loop(0, 3, body, 0)
        out_ref[...] = jnp.zeros((1, N), jnp.int32)
        for b in range(B):
            p_out[b] = p_s[b]

    try:
        _, p = pcall(
            k8,
            out_shape=(jax.ShapeDtypeStruct((1, N), jnp.int32),
                       jax.ShapeDtypeStruct((B,), jnp.int32)),
            in_specs=[smem()], out_specs=(vmem(), smem()),
            scratch_shapes=[pltpu.SMEM((B,), jnp.int32)],
        )(jnp.arange(10, 10 + B, dtype=jnp.int32))
        check("P8 smem ptr loop", p,
              np.arange(10, 10 + B, dtype=np.int32)
              + 3 * (np.arange(B, dtype=np.int32) + 1))
    except Exception as e:
        print(f"  P8: ERROR {type(e).__name__}: {e}")
        results.append(("P8", False))

    bad = [n for n, ok in results if not ok]
    print(f"MOSAIC_PRIMS: {'OK' if not bad else 'FAILED ' + ','.join(bad)}")


if __name__ == "__main__":
    try:
        main()
    except Exception:
        traceback.print_exc()
        print("MOSAIC_PRIMS: FAILED (top-level)")
