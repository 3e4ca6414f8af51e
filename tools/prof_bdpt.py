"""Round-3 BDPT per-stage decomposition: where do 178 ms/sample go?

Times, with the renderer's real config on the colonnade headline scene:
  1. the full BDPT sample step (radiance + accum)
  2. the (2R,) subpath batch trace alone, on the real subpath rays
  3. the (4R,) shadow batch trace alone, on the real connection rays
     (bright mask + t_cap, like integrators/bdpt.py:237-240)
  4. shadow-lane statistics: live fraction, cap distribution

Honest async-dispatch timing (see prof_r2c.py). Usage:
  python tools/prof_bdpt.py [subdiv]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudapathtracer_tpu import RenderConfig, make_camera
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.render import renderer as rd
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.integrators import bdpt as bd
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, SiteGroups, uniform_sites
from cudapathtracer_tpu.ops.sampling import (
    cosine_hemisphere, sample_triangle_point, triangle_areas,
    uniform_hemisphere,
)
from cudapathtracer_tpu.ops.shading import (
    light_lookup, make_light_table, make_shade_table, pick_light_slot,
    tri_shading,
)
from cudapathtracer_tpu.ops.vecmath import Vec3, dot, max_component, normalized_safe, safe_length
from cudapathtracer_tpu.utils.constants import EPS_HIT, EPS_VISIBILITY, MAX_FLOAT, THROUGHPUT_CUTOFF

SIZE = 1024
R = SIZE * SIZE


def timed(name, fn, *args, iters=4):
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
    per = best / iters * 1000.0
    print(f"{name:44s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    cfg = RenderConfig(width=SIZE, height=SIZE, integrator="bdpt")
    bvh = rd.build_bvh_for_scene(scene, cfg.leaf_size)
    prep = rd.make_packet_prep(scene, cfg, bvh)
    trace_fn, _ = rd.make_trace_fn(scene, cfg, bvh, prep=prep)
    print(f"tris={scene.num_tris}", flush=True)

    cam = make_camera(width=SIZE, height=SIZE)
    idx = jnp.arange(R, dtype=jnp.uint32)
    key = jax.random.PRNGKey(1234)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)

    @jax.jit
    def primary(idx):
        o, d = camera_rays(cam, idx, keys, jitter=False, lens=False)
        return o, d, trace_fn(o, d, jnp.ones((R,), bool))

    o, d, hit0 = primary(idx)

    # ---- reconstruct the integrator's exact intermediate rays ----
    @jax.jit
    def build_rays(o, d, hit0):
        areas = triangle_areas(scene, scene.lights)
        total_area = scene.total_light_area
        shade_tab = make_shade_table(scene)
        light_tab = make_light_table(scene)
        _us = uniform_sites(keys, SiteGroups.BDPT, 7)
        slot = pick_light_slot(total_area * _us[0], areas)
        lv0, la1, la2, lnorm, _ltri, l_e = light_lookup(
            light_tab, slot, with_emission=True)
        p = sample_triangle_point(lv0, la1, la2, _us[1], _us[2])
        x0 = p + lnorm * EPS_HIT
        t = hit0.t - EPS_HIT
        missed = t > MAX_FLOAT - 1.0
        tri = jnp.where(missed, 0, jnp.maximum(hit0.tri, 0))
        t = jnp.where(missed, 0.0, t)
        x3 = o + d * t
        n3, alb3, _, _ = tri_shading(shade_tab, tri)
        o_dir = uniform_hemisphere(lnorm, _us[3], _us[4], False)
        d2dir = cosine_hemisphere(n3, _us[5], _us[6], False)
        return x0, x3, o_dir, d2dir

    x0, x3, o_dir, d2dir = build_rays(o, d, hit0)

    def _cat(a, b):
        return Vec3(jnp.concatenate([a.x, b.x]),
                    jnp.concatenate([a.y, b.y]),
                    jnp.concatenate([a.z, b.z]))

    @jax.jit
    def subpath_batch(x0, x3, o_dir, d2dir):
        return trace_fn(_cat(x0, x3), _cat(o_dir, d2dir),
                        jnp.ones((2 * R,), bool))

    hb = timed("subpath (2R) batch trace", subpath_batch, x0, x3, o_dir, d2dir)

    # full integrator step for reference + capture connection rays
    @jax.jit
    def full_sample(o, d, hit0):
        return bd.radiance_bdpt(o, d, scene, trace_fn, keys,
                                primary_hit=hit0)

    tot = timed("full BDPT sample (radiance)", full_sample, o, d, hit0)

    # shadow batch: capture the integrator's exact 4R inputs by recording
    # them through a wrapping trace_fn (eager call, so the arrays are real).
    rec = {}
    def rec_trace(o_, d_, m_, t_cap=None):
        if t_cap is not None:
            rec["o"], rec["d"], rec["m"], rec["cap"] = o_, d_, m_, t_cap
        return trace_fn(o_, d_, m_, t_cap=t_cap)

    _ = bd.radiance_bdpt(o, d, scene, rec_trace, keys, primary_hit=hit0)
    so, sd_, sm, scap = (jax.device_get(rec["o"]), jax.device_get(rec["d"]),
                         np.asarray(rec["m"]), np.asarray(rec["cap"]))
    print(f"shadow lanes live: {sm.sum()} / {sm.size} "
          f"({100.0 * sm.mean():.1f}%)  cap p50={np.percentile(scap[sm], 50):.2f} "
          f"p95={np.percentile(scap[sm], 95):.2f}", flush=True)

    som = Vec3(jnp.asarray(so.x), jnp.asarray(so.y), jnp.asarray(so.z))
    sdm = Vec3(jnp.asarray(sd_.x), jnp.asarray(sd_.y), jnp.asarray(sd_.z))
    smj = jnp.asarray(sm)
    scj = jnp.asarray(scap)

    @jax.jit
    def shadow_batch(o_, d_, m_, cap):
        return trace_fn(o_, d_, m_, t_cap=cap)

    sh = timed("shadow (4R) batch trace", shadow_batch, som, sdm, smj, scj)
    print(f"sum check: 2R {hb:.1f} + 4R {sh:.1f} = {hb + sh:.1f} "
          f"vs full {tot:.1f} (rest = integrator math)", flush=True)


if __name__ == "__main__":
    main()
