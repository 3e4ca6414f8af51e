"""TPU train-step throughput: packet engine vs per-ray walk in the
gradient pass (round-4 verdict item 3).

Measures one jitted value_and_grad step of the L2 inverse-rendering loss
(diff/render_grad.py) with cfg.traversal = 'packets' (the Mosaic fast
path, now wired through renderer.make_trace_fn) vs 'bvh' (the per-ray
skip-link walk the diff pass used through round 3).

Usage: python tools/prof_train.py [subdiv] [size] [spp]
Honest async-dispatch timing with host readback (CLAUDE.md: never trust
block_until_ready through the tunnel).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudapathtracer_tpu import RenderConfig, make_camera
from cudapathtracer_tpu.diff import render_grad as rg
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    print("device:", jax.devices()[0], flush=True)

    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    print(f"tris={scene.num_tris} size={size} spp={spp}", flush=True)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                      focal_length=2.0)
    key = jax.random.PRNGKey(1234)

    for traversal in ("packets", "bvh"):
        cfg = RenderConfig(width=size, height=size, spp=spp,
                           integrator="pt_nee", samples_per_call=spp,
                           traversal=traversal)
        bvh = build_bvh_for_scene(scene, cfg.leaf_size)
        target = rg.render_image_diff(scene, cam, cfg,
                                      jax.random.PRNGKey(9), spp, bvh=bvh)
        loss_fn = rg.make_loss_fn(scene, cam, cfg, key, spp, bvh=bvh)
        step = jax.jit(jax.value_and_grad(loss_fn))
        p0 = rg.targets_of(scene)

        t0 = time.time()
        loss, grads = step(p0, target)
        l0 = float(np.asarray(loss))
        print(f"{traversal:8s} compile+first: {time.time()-t0:7.1f}s "
              f"loss={l0:.5f}", flush=True)

        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(2):
                loss, grads = step(p0, target)
            float(np.asarray(loss))
            best = min(best, (time.time() - t0) / 2)
        rays = size * size * spp * (cfg.num_bounces + 1)
        print(f"{traversal:8s} step {best*1000:9.2f} ms  "
              f"grad_mrays {rays/best/1e6:7.2f}  "
              f"|g_alb|={float(np.abs(np.asarray(grads.albedo.x)).max()):.3e}",
              flush=True)


if __name__ == "__main__":
    main()
