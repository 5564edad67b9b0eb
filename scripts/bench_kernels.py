"""Isolated kernel microbenchmarks on the real TPU.

Times the raw conv3x3 and the XLA GN+SiLU+conv composition at the U-Net's
hot shapes with a result-cache-proof harness (see timeit). Steady-state
best-of-rounds, like bench.py.

This file was the ENTRY GATE for the round-2 "stats-carrying resblock
megakernel": the Pallas GN+SiLU+conv kernels (v1 serial-DMA, v2
double-buffered, v3 wide-N) had to match XLA's in-graph conv rate to be
viable. Measured at (8,768,640,256,256) bf16 on v5e: raw conv 142.7 TFLOP/s,
XLA GN+SiLU+conv 109.8, Pallas v3 76.4 — the in-kernel Mosaic matmul rate is
~2x below the bar, so ALL Pallas resblock kernels were deleted (PERF.md
"megakernel gate"). Law, now 5 datapoints strong: on this stack, an opaque
kernel boundary inside the XLA enhance graph always loses unless its
in-kernel compute rate matches XLA's — and it doesn't.

    python scripts/bench_kernels.py --shape 8,768,640,256,256 --impls conv,xla
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




def gn_silu_conv3x3_xla(x, gn_scale, gn_bias, w, b, num_groups, eps=1e-6):
    """Plain XLA composition: fast-variance GroupNorm + SiLU + SAME conv3x3
    (what the backbone actually runs; matches nn/layers.py GroupNorm)."""
    bsz, h, width, c = x.shape
    cg = c // num_groups
    xg = x.reshape(bsz, h * width, num_groups, cg)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=(1, 3), keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    norm = ((xg - mean.astype(x.dtype)) * inv.astype(x.dtype)).reshape(bsz, h, width, c)
    y = norm * gn_scale.astype(x.dtype) + gn_bias.astype(x.dtype)
    y = y * jax.nn.sigmoid(y)
    out = jax.lax.conv_general_dilated(
        y, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b.astype(out.dtype)


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
    p.add_argument("--impls", default="conv,xla")
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
        "xla": jax.jit(lambda *a: gn_silu_conv3x3_xla(*a, args.groups)),
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
