"""Round-3 glue decomposition: where do the non-trace ms of a pt_nee
sample go?

Measures, under the honest async-dispatch harness (queue N dispatches, one
readback — `block_until_ready` does not synchronize through the axon
tunnel):

  1. the FULL sample step (render_batch_jit at spp=samples_per_call=N,
     divided by N),
  2. the same step with the trace stubbed out (trace_fn returns a
     precomputed constant Hit) — i.e. pure integrator glue: RNG, shading
     row gathers, light sampling, accumulation,
  3. individual glue pieces for attribution.

(1) - (2) = the true trace cost inside the sample loop; (2) is the glue
budget that kernel work can never shrink.

Usage: python tools/prof_glue.py [subdiv] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu import RenderConfig, init_accum, make_camera
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.integrators.pt_nee import PTParams, radiance_pt_nee
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key
from cudapathtracer_tpu.ops.traversal import Hit
from cudapathtracer_tpu.render.renderer import (
    build_bvh_for_scene,
    make_trace_fn,
    render_batch_jit,
)
from cudapathtracer_tpu.utils.constants import MAX_FLOAT


def timed(name, fn, *args, iters=32, div=1.0):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
        best = min(best, time.time() - t0)
    per = best / iters / div * 1000.0
    print(f"{name:44s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    R = size * size
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    S = 4
    cfg = RenderConfig(width=size, height=size, spp=S, integrator="pt_nee",
                       samples_per_call=S, reuse_primary_hit=True)
    bvh = build_bvh_for_scene(scene, cfg.leaf_size)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                      focal_length=2.0)
    key = jax.random.PRNGKey(1234)
    print(f"tris={scene.num_tris}", flush=True)

    # floor: the async-dispatch + readback overhead baked into each
    # measurement at these iters (subtract per-iter: floor/iters)
    nul = jax.jit(lambda x: x + 1.0)
    timed("dispatch+readback floor (iters=32)", nul,
          jnp.zeros((8,), jnp.float32), iters=32)

    # (1) full sample step
    full = timed(
        "full render_batch (per sample)",
        lambda: render_batch_jit(scene, bvh, cam, cfg, key,
                                 init_accum(cfg), S),
        iters=8, div=S)

    # (2) glue-only: same integrator, trace stubbed to a constant hit.
    # The stub hit uses plausible values (t=2, tri=pixel%T) so shading
    # gathers and branches run with realistic data.
    trace_fn, _ = make_trace_fn(scene, cfg, bvh)
    idx = jnp.arange(R, dtype=jnp.uint32)
    tri_c = (idx % jnp.uint32(scene.num_tris)).astype(jnp.int32)
    t_c = jnp.full((R,), 2.0, jnp.float32)

    def stub_trace(o, d, mask, t_cap=None):
        # depends on o so XLA cannot hoist it out of the bounce scan
        return Hit(t=t_c + 0.0 * o.x, tri=tri_c)

    from cudapathtracer_tpu.render.camera import camera_rays

    params = PTParams(num_bounces=cfg.num_bounces,
                      orthonormal_frame=cfg.orthonormal_frame,
                      light_normal_mode=cfg.light_normal_mode,
                      branch_pdf_correction=cfg.branch_pdf_correction)

    @jax.jit
    def glue_only(key):
        def one(i, acc):
            keys = pixel_keys(sample_key(key, i), idx)
            o, d = camera_rays(cam, idx, keys, jitter=False)
            rad = radiance_pt_nee(o, d, scene, stub_trace, keys, params)
            return acc + rad.x
        return jax.lax.fori_loop(0, S, one, jnp.zeros((R,), jnp.float32))

    glue = timed("glue only (stub trace, per sample)",
                 lambda: glue_only(key), iters=8, div=S)

    # (3) pieces
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    o, d = jax.jit(lambda: camera_rays(cam, idx, keys, jitter=False))()
    o = jax.block_until_ready(o)

    from cudapathtracer_tpu.ops.rng import SiteGroups, uniform_sites
    from cudapathtracer_tpu.ops.shading import (
        hit_shading, make_light_table, make_shade_table, pick_light_slot,
    )
    from cudapathtracer_tpu.ops.sampling import triangle_areas

    shade_tab = make_shade_table(scene)

    timed("pixel_keys + camera_rays",
          jax.jit(lambda k: camera_rays(
              cam, idx, pixel_keys(sample_key(k, jnp.int32(1)), idx),
              jitter=False)), key)
    timed("uniform_sites x6 (one bounce)",
          jax.jit(lambda k: uniform_sites(
              pixel_keys(sample_key(k, jnp.int32(1)), idx),
              SiteGroups.PT_BOUNCE, 6, bounce=1)), key)
    timed("hit_shading row gather",
          jax.jit(lambda tt: hit_shading(shade_tab, None, scene.num_tris,
                                         tri_c, o + d * tt)), t_c)
    areas = triangle_areas(scene, scene.lights)
    timed("pick_light_slot",
          jax.jit(lambda u: pick_light_slot(
              scene.total_light_area * u,
              areas)), jnp.linspace(0, 1, R))

    print(f"\ntrace cost inside sample loop ~= {full - glue:.2f} ms "
          f"({(full - glue) / 2:.2f} per bounce trace x2)", flush=True)


if __name__ == "__main__":
    main()
