#!/usr/bin/env python3
"""Device-level profiler trace capture (``jax.profiler``) — the TPU
equivalent of the reference's timing harnesses (SURVEY §5.1; ref
yolox/core/trainer.py MeterBuffer + submit/main.py --profiling phase
timers are host-side: on TPU the ground truth is the device trace).

Captures a TensorBoard-loadable trace (``.xplane.pb`` + host events)
around N executions of one of the production programs:

  --program step    the full donated train step (b128/640 default)
  --program infer   the deployment forward+postprocess (slim graph shape
                    is the bench.py headline; this uses the dense model
                    so no pruning artifacts are needed)

Each iteration is wrapped in a ``jax.profiler.StepTraceAnnotation`` so
TensorBoard's trace viewer groups ops per step, and the model/loss/opt
phases carry ``TraceAnnotation`` scopes.  View with:
    tensorboard --logdir <out>   (any machine with tensorboard)

Over the axon tunnel the DEVICE plane may be absent (the relay does not
forward the profiler stream) — the tool detects this and says which
planes landed instead of silently writing a host-only trace.  Run with
--cpu for a tunnel-free smoke (host plane only, still exercises the
whole capture path).

Usage:
    python tools/profile_trace.py --program step -b 128 --size 640 \
        --iters 3 -o outputs/trace_step
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))


def _build_step(args):
    """Production train step on random data (profile_train.py shapes)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import traverse_util

    from cocodet_tpu.core.train_state import (create_train_state,
                                              make_train_step)
    from cocodet_tpu.models import build_model

    model = build_model("yolox-p6", depth=args.depth, width=args.width,
                        dtype=jnp.bfloat16)

    def decay_mask(params):
        flat = traverse_util.flatten_dict(params)
        return traverse_util.unflatten_dict(
            {k: (k[-1] == "kernel") for k in flat})

    tx = optax.chain(
        optax.add_decayed_weights(5e-4, mask=decay_mask),
        optax.sgd(0.01, momentum=0.9, nesterov=True))
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
    state = create_train_state(model, tx, jax.random.PRNGKey(0), imgs[:1])
    step = make_train_step(model, tx, strides=(8, 16, 32, 64),
                           num_classes=80)

    def run_one(carry):
        st = carry
        st, metrics = step(st, imgs, labels, use_l1=False)
        return st, metrics["loss"]

    return run_one, state


def _build_infer(args):
    """Deployment forward + decode + NMS (dense fused model)."""
    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    model = build_model("yolox-p6", depth=args.depth, width=args.width,
                        dtype=jnp.bfloat16, fused=True)
    b, s = args.batch_size, args.size
    imgs = jnp.asarray(np.random.RandomState(0).rand(b, s, s, 3) * 255,
                       jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), imgs[:1])
    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                            pre_nms_topk=1024, max_det=300)

    @jax.jit
    def fwd(tok, images):
        out = postprocess(model.apply(variables, images + tok),
                          (8, 16, 32, 64), cfg)
        s = out.scores.astype(jnp.float32).sum()
        return s * 1e-9, s

    def run_one(carry):
        tok, total = fwd(carry, imgs)
        return tok, total

    return run_one, jnp.float32(0)


def main():
    ap = argparse.ArgumentParser("profile_trace")
    ap.add_argument("--program", choices=["step", "infer"], default="step")
    ap.add_argument("-b", "--batch-size", type=int, default=128)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--depth", type=float, default=0.67)
    ap.add_argument("--width", type=float, default=0.75)
    ap.add_argument("-o", "--out", default="outputs/trace")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU backend (tunnel-free smoke)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"# backend: {jax.devices()[0].platform}", flush=True)

    build = _build_step if args.program == "step" else _build_infer
    run_one, carry = build(args)

    # compile OUTSIDE the trace so the capture holds steady-state steps,
    # not the remote-compile wait.
    print("# compiling (outside the trace)", flush=True)
    carry, out = run_one(carry)
    _ = float(out)  # host readback barrier (ROADMAP timing gotcha)

    os.makedirs(args.out, exist_ok=True)
    print(f"# tracing {args.iters} steps -> {args.out}", flush=True)
    jax.profiler.start_trace(args.out)
    try:
        for i in range(args.iters):
            with jax.profiler.StepTraceAnnotation(args.program, step_num=i):
                carry, out = run_one(carry)
            _ = float(out)
    finally:
        jax.profiler.stop_trace()

    # Report what landed: a tunnel-backed device may contribute no device
    # plane — say so instead of shipping a silently host-only trace.
    files = sorted(glob.glob(os.path.join(args.out, "**", "*"),
                             recursive=True))
    xplanes = [f for f in files if f.endswith(".xplane.pb")]
    total = sum(os.path.getsize(f) for f in files if os.path.isfile(f))
    print(f"# trace files: {len(files)} ({total / 1e6:.1f} MB)")
    for f in files:
        if os.path.isfile(f):
            print(f"#   {os.path.relpath(f, args.out)} "
                  f"({os.path.getsize(f) / 1e3:.0f} kB)")
    if not xplanes:
        print("# WARNING: no .xplane.pb captured — profiler stream not "
              "available on this backend (tunnel relay does not forward "
              "it); host-side timing tools (profile_train.py, "
              "bench_breakdown.py) are the fallback", flush=True)
    else:
        print(f"# ok: {len(xplanes)} xplane file(s); view with "
              f"`tensorboard --logdir {args.out}`", flush=True)


if __name__ == "__main__":
    main()
