#!/usr/bin/env python3
"""Train-step stage bisection on the real chip: where do the 472 ms go?

Times four nested programs at the production training point (b128/640):
  1. model fwd (train=True, BN mutable)         — the conv stack
  2. + SimOTA + losses (loss fwd)               — assignment cost
  3. value_and_grad of (2)                      — backward (convs + the
     gather->scatter transposes of the loss)
  4. full train step (3 + SGD + EMA)            — optimizer overhead

Each stage chains its iterations through a real data dependency and ends
with a host scalar readback (the only trustworthy barrier under the remote
tunnel — ROADMAP.md timing gotcha).  Compile cost: 4 remote programs.

Usage: python tools/profile_train.py [-b 128] [--size 640] [--iters 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def main():
    ap = argparse.ArgumentParser("profile_train")
    ap.add_argument("-b", "--batch-size", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("--stages", default="fwd,loss,grad,step",
                    help="comma subset of fwd,loss,grad,step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax import traverse_util

    from cocodet_tpu.core.train_state import (create_train_state,
                                              make_train_step)
    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.losses import yolox_losses

    model = build_model("yolox-p6", depth=args.depth, width=args.width,
                        dtype=jnp.bfloat16)

    def decay_mask(params):
        flat = traverse_util.flatten_dict(params)
        return traverse_util.unflatten_dict(
            {k: (k[-1] == "kernel") for k in flat})

    tx = optax.chain(
        optax.add_decayed_weights(5e-4, mask=decay_mask),
        optax.sgd(0.01, momentum=0.9, nesterov=True),
    )

    rng = jax.random.PRNGKey(0)
    b, s = args.batch_size, args.size
    imgs = jnp.asarray(np.random.RandomState(0).rand(b, s, s, 3) * 255,
                       jnp.float32)
    rs = np.random.RandomState(1)
    labels = np.zeros((b, 50, 5), np.float32)
    for i in range(b):
        n = rs.randint(3, 15)
        labels[i, :n, 0] = rs.randint(0, 80, n)
        labels[i, :n, 1:3] = rs.uniform(64, s - 64, (n, 2))
        labels[i, :n, 3:5] = rs.uniform(16, 128, (n, 2))
    labels = jnp.asarray(labels)

    state = create_train_state(model, tx, rng, imgs[:1])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    strides = (8, 16, 32, 64)

    def bench(name, fn, x0):
        """fn: (carry, imgs) -> (new_carry, scalar); carry chains iters."""
        t0 = time.perf_counter()
        carry, out = fn(x0, imgs)
        _ = float(out)
        print(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry, out = fn(carry, imgs)
        _ = float(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1e3:.1f} ms ({b / dt:.1f} img/s)", flush=True)
        return dt

    stages = args.stages.split(",")
    res = {}

    if "fwd" in stages:
        @jax.jit
        def fwd_only(tok, images):
            # chain via tok added to the input so iterations serialize
            outs, _ = model.apply(
                variables, images + tok, train=True, mutable=["batch_stats"])
            sums = sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree_util.tree_leaves(outs))
            return sums * 1e-12, sums

        res["fwd"] = bench("model fwd (train)", fwd_only, jnp.float32(0))

    if "loss" in stages:
        @jax.jit
        def loss_fwd(tok, images):
            outs, _ = model.apply(
                variables, images + tok, train=True, mutable=["batch_stats"])
            losses, _ = yolox_losses(outs, labels, strides=strides,
                                     num_classes=80, use_l1=False)
            return losses.total * 1e-12, losses.total

        res["loss"] = bench("loss fwd", loss_fwd, jnp.float32(0))

    if "grad" in stages:
        def raw_loss(params, images):
            outs, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            losses, _ = yolox_losses(outs, labels, strides=strides,
                                     num_classes=80, use_l1=False)
            return losses.total

        @jax.jit
        def grad_only(tok, images):
            loss, grads = jax.value_and_grad(raw_loss)(
                state.params, images + tok)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return gsum * 1e-20, loss + gsum * 0

        res["grad"] = bench("value_and_grad", grad_only, jnp.float32(0))

    if "step" in stages:
        step = make_train_step(model, tx, strides=strides, num_classes=80)
        st = state

        t0 = time.perf_counter()
        st, metrics = step(st, imgs, labels, use_l1=False)
        _ = float(metrics["loss"])
        print(f"  full step: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            st, metrics = step(st, imgs, labels, use_l1=False)
        _ = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"full step: {dt * 1e3:.1f} ms ({b / dt:.1f} img/s)",
              flush=True)
        res["step"] = dt

    if {"fwd", "loss", "grad", "step"} <= res.keys():
        print(f"\nbreakdown @ b{b}/{s}:")
        print(f"  conv fwd           : {res['fwd'] * 1e3:7.1f} ms")
        print(f"  simota+loss fwd    : {(res['loss'] - res['fwd']) * 1e3:7.1f} ms")
        print(f"  backward           : {(res['grad'] - res['loss']) * 1e3:7.1f} ms")
        print(f"  optimizer+EMA      : {(res['step'] - res['grad']) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
