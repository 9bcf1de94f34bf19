#!/usr/bin/env python3
"""Filter-gradient conv layout A/B (VERDICT r4 item 7 / TRAINING_MFU.md).

The round-4 device trace pinned the training-MFU ceiling on the backward's
batch-contracting filter-grad convs (43% of bf16 peak vs 48-56% forward).
This measures, per representative layer shape of the M-P6 stack at
640/b128, three formulations of dW = grad_filter(conv(x, W)):

  native   — XLA's own transpose rule for conv_general_dilated (what
             jax.grad emits inside the train step today).
  flipped  — explicit conv_general_dilated computing dW = conv(x, dy)
             with dimension_numbers that map batch -> contracting feature
             ("NHWC,HWIO->HWIO" trick: lhs=x as C-major batch, rhs=dy as
             features), the classic alternative tiling.
  matmul   — im2col-free patch einsum: dW[kh,kw,ci,co] =
             sum_{b,h,w} x[b,h+kh,w+kw,ci] * dy[b,h,w,co] expressed as a
             lax.dot_general over (b*h*w), forcing the MXU's native
             matmul tiler instead of the conv tiler.

If any alternative beats native by >5% on the dominant shapes, a
custom_vjp conv is worth wiring into models/blocks.py; otherwise
TRAINING_MFU.md closes with the ceiling measured as genuinely exhausted
(ref hot loop: /root/reference/yolox/core/trainer.py:109-148).

Run on the v5e (single TPU client!):
  python tools/grad_conv_ab.py [--cpu] [--batch 128]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

# (name, H=W, cin, cout, kernel, stride) — the M-P6 (w0.75) conv family at
# 640 px that dominates the trace (dark2..dark5 3x3s + a stride-2).
SHAPES = [
    ("dark2_3x3", 160, 96, 96, 3, 1),
    ("dark3_3x3", 80, 192, 192, 3, 1),
    ("dark4_3x3", 40, 384, 384, 3, 1),
    ("dark5_3x3", 20, 576, 576, 3, 1),
    ("down_s2", 80, 192, 384, 3, 2),
]


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    b = args.batch
    dt = jnp.bfloat16
    rows = []
    for name, hw, cin, cout, k, stride in SHAPES:
        oh = hw // stride
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.rand(b, hw, hw, cin), dt)
        dy = jnp.asarray(rs.rand(b, oh, oh, cout), dt)
        w_shape = (k, k, cin, cout)
        dn = lax.conv_dimension_numbers(x.shape, w_shape,
                                        ("NHWC", "HWIO", "NHWC"))
        pad = ((k // 2, k // 2), (k // 2, k // 2))

        @jax.jit
        def native(x, dy):
            def f(w):
                return lax.conv_general_dilated(
                    x, w, (stride, stride), pad, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
            w0 = jnp.zeros(w_shape, dt)
            _, vjp = jax.vjp(f, w0)
            return vjp(dy.astype(jnp.float32))[0]

        @jax.jit
        def flipped(x, dy):
            # dW = conv(x^T, dy^T): treat batch as the contracting feature
            # dim.  lhs = x transposed to (Cin, H, W, B) "NHWC"-style with
            # Cin as batch; rhs = dy as (H, W, B, Cout) HWIO with B as
            # input features; output (Cin, kh, kw, Cout) -> transpose.
            lhs = jnp.transpose(x, (3, 1, 2, 0))        # (Cin, H, W, B)
            rhs = jnp.transpose(dy, (1, 2, 0, 3))       # (oh, ow, B, Cout)
            dnums = lax.conv_dimension_numbers(
                lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
            out = lax.conv_general_dilated(
                lhs, rhs, window_strides=(1, 1), padding=pad,
                lhs_dilation=(1, 1), rhs_dilation=(stride, stride),
                dimension_numbers=dnums,
                preferred_element_type=jnp.float32)      # (Cin, kh, kw, Cout)
            return jnp.transpose(out, (1, 2, 0, 3))

        @jax.jit
        def matmul(x, dy):
            # explicit patch dot_general: contract (b, oh, ow) between
            # shifted x patches and dy.  k*k separate (B*OH*OW, Cin) x
            # (B*OH*OW, Cout) matmuls -> HWIO stack.
            outs = []
            p = k // 2
            xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
            for kh in range(k):
                for kw in range(k):
                    patch = lax.dynamic_slice(
                        xp, (0, kh, kw, 0), (b, hw, hw, cin))
                    if stride > 1:
                        patch = patch[:, ::stride, ::stride, :]
                    d = lax.dot_general(
                        patch.reshape(-1, cin), dy.reshape(-1, cout),
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    outs.append(d)
            return jnp.stack(outs, 0).reshape(k, k, cin, cout)

        row = {"layer": name, "shape": f"b{b}x{hw}x{hw}x{cin}->{cout}k{k}s{stride}"}
        flops = 2.0 * b * oh * oh * k * k * cin * cout
        for label, fn in (("native", native), ("flipped", flipped),
                          ("matmul", matmul)):
            try:
                t = timeit(fn, x, dy, iters=args.iters)
                row[label + "_ms"] = round(t * 1e3, 3)
                row[label + "_tfs"] = round(flops / t / 1e12, 1)
            except Exception as e:  # noqa: BLE001 — report per-variant
                row[label + "_ms"] = f"ERR {type(e).__name__}"
        # numeric agreement check (bf16 inputs, f32 accum)
        try:
            ref = np.asarray(jax.device_get(native(x, dy)), np.float32)
            alt = np.asarray(jax.device_get(flipped(x, dy)), np.float32)
            row["flipped_relerr"] = round(float(
                np.abs(alt - ref).max() / (np.abs(ref).max() + 1e-9)), 5)
            alt2 = np.asarray(jax.device_get(matmul(x, dy)), np.float32)
            row["matmul_relerr"] = round(float(
                np.abs(alt2 - ref).max() / (np.abs(ref).max() + 1e-9)), 5)
        except Exception:
            pass
        print(json.dumps(row), flush=True)
        rows.append(row)

    def tot(key):
        return sum(r[key] for r in rows if isinstance(r.get(key), float))

    print(json.dumps({"total_native_ms": round(tot("native_ms"), 2),
                      "total_flipped_ms": round(tot("flipped_ms"), 2),
                      "total_matmul_ms": round(tot("matmul_ms"), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
