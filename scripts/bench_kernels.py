"""Isolated kernel microbenchmarks on the real TPU.

Times the fused GN+SiLU+conv3x3 Pallas kernels (v1 two-phase, v2
stats-in-XLA double-buffered) against the plain XLA composition at the
U-Net's hot shapes. Steady-state best-of-rounds, like bench.py.

    python scripts/bench_kernels.py --shape 1,768,640,256,256
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import bench  # noqa: E402, F401  (persistent compile cache)
import jax
import jax.numpy as jnp
import numpy as np

from flowdec_tpu.ops.gn_act_conv_pallas import (  # noqa: E402
    gn_silu_conv3x3,
    gn_silu_conv3x3_v2,
    gn_silu_conv3x3_v3,
    gn_silu_conv3x3_reference,
)


def timeit(fn, args, iters=20, rounds=3):
    """Time fn(x, *rest) via an in-jit scan that perturbs x each iteration.

    CRITICAL on this remote runtime: repeated executions with IDENTICAL
    buffers are served from a result cache (measured: a chained 4096^3
    matmul 'ran' at 90 PFLOPS), so classic same-args loops time the network
    tunnel, not the chip. Perturbing the input inside one compiled scan
    forces real sequential device work; the scan's total wall time is the
    signal.
    """
    x, rest = args[0], args[1:]

    @jax.jit
    def run(x, *rest):
        def body(carry, i):
            o = fn(carry, *rest)
            # feed the FULL output into the next input: a scalar feedback is
            # not enough — XLA pushes slice through dot AND conv, DCE-ing
            # the rest of the op (measured: conv3x3 "ran" at 398 TFLOP/s,
            # 2× chip peak, with scalar feedback). cout==cin here so shapes
            # line up; the per-iter elementwise add is ~1 HBM pass of
            # overhead, identical across impls.
            assert o.shape == carry.shape, "timeit needs cout == cin"
            return x + (o * 1e-3).astype(x.dtype), ()
        c, _ = jax.lax.scan(body, x, jnp.arange(iters))
        return c

    run(x, *rest).block_until_ready()
    best = float("inf")
    for r in range(rounds):
        xr = x * (1.0 + 1e-3 * (r + 1))
        jax.block_until_ready(xr)
        t0 = time.perf_counter()
        run(xr, *rest).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shape", default="1,768,640,256,256",
                   help="B,H,W,Cin,Cout")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--groups", type=int, default=32)
    p.add_argument("--impls", default="xla,v1,v2")
    args = p.parse_args()

    b, h, w_, ci, co = (int(v) for v in args.shape.split(","))
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w_, ci)), dt)
    s = jnp.asarray(rng.random(ci) + 0.5, jnp.float32)
    bi = jnp.asarray(rng.standard_normal(ci) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05, dt)
    bc = jnp.asarray(rng.standard_normal(co) * 0.1, jnp.float32)

    def conv_only(x, s, bi, w, bc):
        # raw SAME conv3x3 — isolates XLA's conv rate at this shape. The
        # |x| makes the op NONLINEAR in x: without it XLA hoists the conv
        # out of the timing scan (conv(x·s) = s·conv(x)) and the measurement
        # reads 2× above chip peak (observed: "405 TFLOPS").
        return jax.lax.conv_general_dilated(
            jnp.abs(x), w.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    impls = {
        "conv": jax.jit(conv_only),
        "xla": jax.jit(lambda *a: gn_silu_conv3x3_reference(*a, args.groups)),
        "v1": jax.jit(lambda *a: gn_silu_conv3x3(*a, args.groups)),
        "v2": jax.jit(lambda *a: gn_silu_conv3x3_v2(*a, args.groups)),
        "v3": jax.jit(lambda *a: gn_silu_conv3x3_v3(*a, args.groups)),
    }
    ref = None
    for name in args.impls.split(","):
        fn = impls[name]
        out = np.asarray(fn(x, s, bi, w, bc), np.float32)
        if ref is None:
            ref = out
        else:
            d = float(np.abs(out - ref).max())
            print(f"  {name} max|diff vs first| = {d:.2e}")
        ms = timeit(fn, (x, s, bi, w, bc))
        flops = b * h * w_ * ci * co * 9 * 2
        print(f"{name:4s} {ms:8.2f} ms   {flops / ms / 1e9:7.1f} TFLOP/s"
              f"   shape={args.shape} {args.dtype}")


if __name__ == "__main__":
    main()
