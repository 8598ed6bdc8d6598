"""int8 lowering probe: does v5e int8 MXU throughput (2x bf16 peak) reach
XLA-lowered convs/matmuls at the codec's hot shapes?

Decides whether a w8a8 quantized-inference path (PERF.md roadmap #4) is
worth building.  Compares, fenced (docs/PERF.md "Measurement integrity"):

1. conv5s2 192ch @256x384 (the transform workhorse): bf16 baseline vs
   int8 operands -> int32 accumulate (+ fp rescale epilogue, the shape a
   real w8a8 path would run).
2. dense conv3x3 192ch @128x192: same pair.
3. pure dot_general at matched FLOPs — the MXU ceiling for each dtype.

Run on the TPU via the queue (rd_runs/queue.txt).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def fence(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[-1])


def timeit(f, *args, iters=10, repeats=5):
    out = f(*args)
    fence(out)
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        fence(out)
        vals.append((time.perf_counter() - t0) / iters * 1e3)
    return statistics.median(vals)


def main():
    from lic_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    results = {}

    def conv(x, k, stride, acc_dtype):
        return lax.conv_general_dilated(
            x, k, (stride, stride), [(1, 2), (1, 2)] if stride == 2 else
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype,
        )

    for tag, (b, h, w, c, kk, stride) in {
        "conv5s2@256x384": (8, 256, 384, 192, 5, 2),
        "conv3s1@128x192": (8, 128, 192, 192, 3, 1),
    }.items():
        x_f = rng.standard_normal((b, h, w, c)).astype(np.float32)
        k_f = (rng.standard_normal((kk, kk, c, c)) * 0.05).astype(np.float32)
        x_bf = jnp.asarray(x_f, jnp.bfloat16)
        k_bf = jnp.asarray(k_f, jnp.bfloat16)
        x_i8 = jnp.asarray(np.clip(np.round(x_f * 16), -127, 127), jnp.int8)
        k_i8 = jnp.asarray(np.clip(np.round(k_f * 256), -127, 127), jnp.int8)
        sc = jnp.float32(1.0 / (16 * 256))

        bf = jax.jit(lambda x, k: conv(x, k, stride, jnp.float32))
        # epilogue models the real w8a8 path: int32 accum -> fp rescale
        i8 = jax.jit(
            lambda x, k: conv(x, k, stride, jnp.int32).astype(jnp.float32) * sc
        )
        flop = 2 * b * (h // stride) * (w // stride) * kk * kk * c * c
        try:
            t_bf = timeit(bf, x_bf, k_bf)
            t_i8 = timeit(i8, x_i8, k_i8)
            results[tag] = {
                "bf16_ms": round(t_bf, 3),
                "int8_ms": round(t_i8, 3),
                "bf16_tfs": round(flop / t_bf / 1e9, 1),
                "int8_tops": round(flop / t_i8 / 1e9, 1),
                "speedup": round(t_bf / t_i8, 3),
            }
        except Exception as e:  # unsupported lowering — record, keep going
            results[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(tag, results[tag], flush=True)

    # MXU ceiling at matched FLOPs: (M, K) x (K, N) dot
    m, k_, n = 8 * 128 * 192, 512, 512
    a_f = rng.standard_normal((m, k_)).astype(np.float32)
    b_f = rng.standard_normal((k_, n)).astype(np.float32)
    for tag, (aa, bb, acc) in {
        "dot_bf16": (jnp.asarray(a_f, jnp.bfloat16),
                     jnp.asarray(b_f, jnp.bfloat16), jnp.float32),
        "dot_int8": (jnp.asarray(np.clip(np.round(a_f * 16), -127, 127), jnp.int8),
                     jnp.asarray(np.clip(np.round(b_f * 16), -127, 127), jnp.int8),
                     jnp.int32),
    }.items():
        f = jax.jit(lambda x, y, acc=acc: lax.dot_general(
            x, y, (((1,), (0,)), ((), ())), preferred_element_type=acc
        ))
        try:
            t = timeit(f, aa, bb)
            results[tag] = {
                "ms": round(t, 3),
                "tops": round(2 * m * k_ * n / t / 1e9, 1),
            }
        except Exception as e:
            results[tag] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(tag, results[tag], flush=True)

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
