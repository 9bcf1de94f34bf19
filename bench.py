"""End-of-round benchmark: YOLOX-M-P6 fused inference throughput at 640px.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md): the reference publishes a competition
latency index (216.52 on A100, batch 16 @832) rather than img/s. The
BASELINE.json north-star is ">= 2x the reference's A100 images/sec on one
v5e chip at 640px". We estimate the reference's A100 throughput for the
dense YOLOX-M-P6 at 640px fp16 batch 32 at ~520 img/s (A100 delivers
~310 TFLOPs fp16; the 37 GFLOP/img model at ~35%% MXU-equivalent
efficiency + NMS overhead); vs_baseline = measured / (2 * 520) so 1.0 means
the 2x target is met. This stands until a measured torch number replaces it.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))


def main():
    import jax
    import jax.numpy as jnp

    from cocodet_tpu.models import build_model
    from cocodet_tpu.ops.postprocess import PostprocessConfig, postprocess

    batch, size = 16, 640
    model = build_model("yolox-p6", depth=0.67, width=0.75,
                        dtype=jnp.bfloat16, fused=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x)

    cfg = PostprocessConfig(conf_threshold=0.001, nms_threshold=0.55,
                            pre_nms_topk=2048, max_det=300,
                            use_pallas=True)

    @jax.jit
    def forward(images):
        return postprocess(model.apply(variables, images),
                           (8, 16, 32, 64), cfg)

    imgs = jnp.asarray(
        np.random.RandomState(0).rand(batch, size, size, 3) * 255,
        jnp.float32)

    # warmup + compile
    jax.block_until_ready(forward(imgs))
    # timed
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    img_s = batch * iters / dt

    baseline_2x = 2 * 520.0
    print(json.dumps({
        "metric": "yolox_m_p6_fused_infer_640_bs16",
        "value": round(img_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_s / baseline_2x, 4),
    }))


if __name__ == "__main__":
    main()
