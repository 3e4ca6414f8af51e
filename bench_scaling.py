"""Multi-chip scaling-efficiency benchmark (BASELINE.md: >= 85% rays/s
scaling 1 chip -> N). Renders the same workload on a 1-device mesh and on
the full mesh and reports parallel efficiency.

Prints one JSON line:
  {"metric": "scaling efficiency 1->N", "value": eff, "unit": "ratio", ...}

On this container only ONE real TPU chip is reachable, so against real
hardware this reports N=1 (efficiency 1.0 by definition). To exercise the
sharded path mechanically, run on virtual CPU devices:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python bench_scaling.py

(CPU timings do not predict ICI behavior; the harness exists so a pod
slice can produce the real number unchanged.)

Env knobs: SCALE_SIZE (default 512), SCALE_SPP (4), SCALE_SUBDIV (2).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")

    import cudapathtracer_tpu as cpt
    from cudapathtracer_tpu.models import procedural
    from cudapathtracer_tpu.parallel import mesh as mesh_mod
    from cudapathtracer_tpu.parallel import shard as shard_mod
    from cudapathtracer_tpu.render.renderer import (
        build_bvh_for_scene,
        init_accum,
    )

    size = int(os.environ.get("SCALE_SIZE", "512"))
    spp = int(os.environ.get("SCALE_SPP", "4"))
    subdiv = int(os.environ.get("SCALE_SUBDIV", "2"))

    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    accel = build_bvh_for_scene(scene, 4)
    cam = cpt.make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                          focal_length=2.0)
    cfg = cpt.RenderConfig(width=size, height=size, spp=spp,
                           integrator="pt_nee", samples_per_call=spp)
    key = jax.random.PRNGKey(7)
    n_all = len(jax.devices())

    def run(n_dev):
        mesh = mesh_mod.make_tile_mesh(n_dev)
        st = shard_mod.render_sharded_jit(
            scene, accel, cam, cfg, key, init_accum(cfg), spp, mesh)
        float(np.asarray(st.img.x[0]))  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            st = shard_mod.render_sharded_jit(
                scene, accel, cam, cfg, key, init_accum(cfg), spp, mesh)
            float(np.asarray(st.img.x[0]))
            best = min(best, time.time() - t0)
        rays = cfg.num_pixels * spp * (cfg.num_bounces + 1)
        return rays / best / 1e6, st

    r1, img1 = run(1)
    if n_all == 1:
        eff = 1.0
        rn = r1
    else:
        rn, imgn = run(n_all)
        eff = rn / (r1 * n_all)
        same = np.array_equal(np.asarray(img1.img.x), np.asarray(imgn.img.x))
        print(f"# sharded == single-device image: {same}", file=sys.stderr)

    print(json.dumps({
        "metric": f"scaling efficiency 1->{n_all} "
                  f"({jax.devices()[0].platform})",
        "value": round(eff, 3),
        "unit": "ratio",
        "vs_baseline": round(eff / 0.85, 3),
    }))
    print(f"# 1-dev {r1:.2f} Mrays/s; {n_all}-dev {rn:.2f} Mrays/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
