#!/usr/bin/env python
"""Benchmark: TinyPerson-tile end-to-end inference throughput on one chip.

Measures images/sec/chip for the flagship detector at the TinyPerson tile
resolution (640x512), including on-device decode + NMS — the hot loop of
tiled TinyPerson evaluation (reference protocol: CroppedTilesFlipAug tiles ->
per-tile forward -> global NMS; SURVEY.md §3.3).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

vs_baseline: BASELINE.json's north star is >=5x mmdetection-on-A100
img/s/chip. mmdetection Adap-RetinaNet-class models run ~40 img/s on A100 at
640x512 (fp16, batched), so baseline parity value = 40 and the 5x target
= 200 img/s/chip. vs_baseline = measured / 40.
"""
import json
import time

MMDET_A100_IMG_PER_S = 40.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship

    # production serving config: bfloat16 compute (MXU-native), f32 params
    model = _flagship(tiny=False, dtype="bfloat16")
    batch = 16
    img = jnp.asarray(np.random.RandomState(0).rand(batch, 512, 640, 3),
                      jnp.float32)
    img_shape = jnp.tile(jnp.asarray([[512, 640]], jnp.int32), (batch, 1))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)

    @jax.jit
    def infer(img, img_shape):
        return model.apply(variables, img, img_shape,
                           method=model.simple_test)

    # warmup / compile (value fetch = hard sync; block_until_ready can
    # return early through the axon tunnel)
    dets, pts = infer(img, img_shape)
    float(dets.bboxes[0, 0, 0])

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        dets, pts = infer(img, img_shape)
    float(dets.bboxes[0, 0, 0])  # hard sync on the last batch
    dt = time.perf_counter() - t0
    img_per_s = batch * n_iters / dt

    print(json.dumps({
        "metric": "tinyperson_tile_inference_640x512",
        "value": round(img_per_s, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_s / MMDET_A100_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
