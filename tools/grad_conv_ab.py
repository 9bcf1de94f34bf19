#!/usr/bin/env python3
"""Filter-gradient conv layout A/B (VERDICT r4 item 7 / TRAINING_MFU.md).

The round-4 device trace pinned the training-MFU ceiling on the backward's
batch-contracting filter-grad convs (43% of bf16 peak vs 48-56% forward).
This measures, per representative layer shape of the M-P6 stack at
640/b128, three formulations of dW = grad_filter(conv(x, W)):

  native   — XLA's own transpose rule for the all-bf16
             conv_general_dilated exactly as models/blocks.py:339 emits it
             under jax.grad (bf16 in, bf16 out, bf16 cotangent — the rhs
             transpose rule requires cotangent dtype == input dtype).
  flipped  — explicit conv computing dW = conv(x^T, dy^T) with batch as
             the contracting feature dim (lhs = x as Cin-major batch,
             rhs = dy as an OHxOW "kernel"), the classic alternative
             tiling; f32 MXU accumulate via preferred_element_type.
  matmul   — im2col-free patch einsum: dW[kh,kw,ci,co] =
             sum_{b,h,w} x[b,h+kh,w+kw,ci] * dy[b,h,w,co] as k*k
             lax.dot_general contractions over (b*oh*ow), forcing the
             MXU's native matmul tiler instead of the conv tiler.

Timing discipline (rev 2 — the first TPU run reported 22,000 TF/s, 100x
over v5e peak, i.e. the compute never executed): every variant's output
is checksum-read-back to the host before timing starts, each timing is
taken at N and 3N chained iterations and the per-iter time is the
DIFFERENCE (t3N - tN) / 2N so fixed dispatch overhead cancels, and a
variant whose 3N time is not >= 2x its N time is flagged SUSPECT and its
TF/s withheld.

If an alternative beats native by >5% on the dominant shapes, a
custom_vjp conv is worth wiring into models/blocks.py; otherwise
TRAINING_MFU.md closes with the ceiling measured as genuinely exhausted
(ref hot loop: /root/reference/yolox/core/trainer.py:109-148).

Run on the v5e (single TPU client!):
  python tools/grad_conv_ab.py [--cpu] [--batch 128] [--iters 10]
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


def _chain_time(fn, x, dy, iters):
    """Wall times of `iters` and `3*iters` scan-chained dependent calls.

    The output of every call feeds a (numerically negligible but not
    XLA-foldable: * 1e-30, never * 0) scalar into the next call's input,
    so executions cannot overlap, be deduped, or DCE'd; the caller takes
    (t3 - t1) / (2 * iters) so fixed dispatch overhead cancels."""
    import jax
    import jax.numpy as jnp

    def scan_n(n):
        def run(x_, dy_):
            def body(carry, _):
                out = fn(x_ + carry.astype(x_.dtype), dy_)
                return out.astype(jnp.float32).sum() * 1e-30, None

            carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    None, length=n)
            return carry
        return jax.jit(run)

    t = {}
    for n in (iters, 3 * iters):
        cfn = scan_n(n)
        jax.block_until_ready(cfn(x, dy))  # compile + first run
        t0 = time.perf_counter()
        jax.block_until_ready(cfn(x, dy))
        t[n] = time.perf_counter() - t0
    return t[iters], t[3 * iters]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, CPU code-path check only")
    args = ap.parse_args()
    if args.smoke:
        SHAPES[:] = [("smoke_3x3", 16, 8, 8, 3, 1), ("smoke_s2", 16, 8, 8, 3, 2)]

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

        def native(x, dy):
            # all-bf16, exactly the blocks.py:339 training formulation;
            # the rhs transpose rule needs cotangent dtype == input dtype
            def f(w):
                return lax.conv_general_dilated(
                    x, w, (stride, stride), pad, dimension_numbers=dn)
            w0 = jnp.zeros(w_shape, dt)
            _, vjp = jax.vjp(f, w0)
            return vjp(dy)[0]

        def flipped(x, dy):
            # dW = conv(x^T, dy^T): batch becomes the contracting feature
            # dim.  lhs = x as (Cin, H, W, B) "NHWC" with Cin as batch;
            # rhs = dy as (oh, ow, B, Cout) HWIO with B as input features;
            # output (Cin, kh, kw, Cout) -> transpose to HWIO.
            lhs = jnp.transpose(x, (3, 1, 2, 0))        # (Cin, H, W, B)
            rhs = jnp.transpose(dy, (1, 2, 0, 3))       # (oh, ow, B, Cout)
            dnums = lax.conv_dimension_numbers(
                lhs.shape, rhs.shape, ("NHWC", "HWIO", "NHWC"))
            out = lax.conv_general_dilated(
                lhs, rhs, window_strides=(1, 1), padding=pad,
                lhs_dilation=(1, 1), rhs_dilation=(stride, stride),
                dimension_numbers=dnums,
                preferred_element_type=jnp.float32)   # (Cin, kh', kw', Cout)
            # strided case: the dilated-dy "kernel" can overshoot k by
            # stride-1 output positions; the kernel grads are the first k
            # (same slice XLA's own rhs transpose rule applies)
            out = out[:, :k, :k, :]
            return jnp.transpose(out, (1, 2, 0, 3)).astype(dt)

        def matmul(x, dy):
            # explicit patch dot_general: contract (b*oh*ow) between
            # shifted x patches and dy — k*k (N, Cin)x(N, Cout) matmuls.
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
            return jnp.stack(outs, 0).reshape(k, k, cin, cout).astype(dt)

        row = {"layer": name,
               "shape": f"b{b}x{hw}x{hw}x{cin}->{cout}k{k}s{stride}"}
        flops = 2.0 * b * oh * oh * k * k * cin * cout

        # numeric agreement first (also forces real execution of each
        # variant before any timing is trusted)
        ref = np.asarray(jax.device_get(
            jax.jit(native)(x, dy)), np.float32)
        row["checksum_native"] = round(float(np.abs(ref).sum()), 2)
        for label, fn in (("flipped", flipped), ("matmul", matmul)):
            try:
                alt = np.asarray(jax.device_get(jax.jit(fn)(x, dy)),
                                 np.float32)
                row[label + "_relerr"] = round(float(
                    np.abs(alt - ref).max() / (np.abs(ref).max() + 1e-9)), 5)
            except Exception as e:  # noqa: BLE001 — report per-variant
                row[label + "_relerr"] = f"ERR {type(e).__name__}"

        for label, fn in (("native", native), ("flipped", flipped),
                          ("matmul", matmul)):
            if isinstance(row.get(label + "_relerr"), str):
                continue
            try:
                t1, t3 = _chain_time(fn, x, dy, args.iters)
                per_iter = (t3 - t1) / (2 * args.iters)
                row[label + "_ms"] = round(per_iter * 1e3, 3)
                if t3 < 2.0 * t1 or per_iter <= 0:
                    row[label + "_SUSPECT"] = (
                        f"t({args.iters})={t1*1e3:.2f}ms "
                        f"t({3*args.iters})={t3*1e3:.2f}ms — nonlinear")
                else:
                    row[label + "_tfs"] = round(flops / per_iter / 1e12, 1)
            except Exception as e:  # noqa: BLE001
                row[label + "_ms"] = f"ERR {type(e).__name__}: {e}"
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
