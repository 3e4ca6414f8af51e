"""Round-3 glue ablation: which pieces of the pt_nee bounce body cost?

Times the stub-trace glue loop (see prof_glue.py) with individual pieces
replaced by constants. Differences attribute the glue budget. Honest
async-dispatch harness (queue N dispatches, one readback).

Run: python tools/prof_glue_ablate.py [subdiv] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu import RenderConfig, make_camera
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops.rng import (
    SiteGroups, pixel_keys, sample_key, uniform_sites,
)
from cudapathtracer_tpu.ops.sampling import (
    cosine_hemisphere, sample_triangle_point, triangle_areas,
)
from cudapathtracer_tpu.ops.shading import (
    hit_shading, light_lookup, make_light_table, make_shade_table,
    pick_light_slot,
)
from cudapathtracer_tpu.ops.vecmath import Vec3, dot, normalized_safe, where
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.utils.constants import EPS_HIT, MAX_FLOAT, PI_REF

S = 4


def timed(name, fn, *args, iters=8, div=S):
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
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    R = size * size
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    cfg = RenderConfig(width=size, height=size, spp=S, integrator="pt_nee",
                       samples_per_call=S, reuse_primary_hit=True)
    build_bvh_for_scene(scene, cfg.leaf_size)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                      focal_length=2.0)
    key = jax.random.PRNGKey(1234)
    print(f"tris={scene.num_tris}", flush=True)

    idx = jnp.arange(R, dtype=jnp.uint32)
    tri_c = (idx % jnp.uint32(scene.num_tris)).astype(jnp.int32)
    t_c = jnp.full((R,), 2.0, jnp.float32)

    areas = triangle_areas(scene, scene.lights)
    total_area = scene.total_light_area
    shade_tab = make_shade_table(scene)
    light_tab = make_light_table(scene)
    num_tris = scene.num_tris

    def make_glue(no_shading=False, no_sites=False, no_brdf=False,
                  no_nee=False, no_book=False):
        zero = Vec3.zeros((R,))
        one_v = Vec3.full((R,), 1.0, 1.0, 1.0)

        def bounce(carry, b, keys):
            o, d, weight, accum, remaining = carry
            active = remaining > 0
            hit_t = t_c + 0.0 * o.x
            hit_tri = tri_c

            t = hit_t - EPS_HIT
            if no_book:
                tri = hit_tri
            else:
                near = t < EPS_HIT
                missed = t > MAX_FLOAT - 1.0
                weight = where(near | missed, zero, weight)
                tri = jnp.where(missed, 0, jnp.maximum(hit_tri, 0))
                t = jnp.where(missed, 0.0, t)

            pos = o + d * t
            if no_shading:
                normal = Vec3.full((R,), 0.0, 1.0, 0.0)
                albedo = Vec3.full((R,), 0.5, 0.5, 0.5)
                emission = zero
            else:
                normal, albedo, emission = hit_shading(
                    shade_tab, None, num_tris, tri, pos)

            is_emissive = emission.x != 0.0
            accum = accum + where(active & is_emissive,
                                  weight * emission, zero)
            weight = where(is_emissive, zero, weight)

            if no_sites:
                us = [jnp.full((R,), 0.3, jnp.float32)] * 6
            else:
                us = uniform_sites(keys, SiteGroups.PT_BOUNCE, 6, bounce=b)

            a = us[0]
            brdf_branch = a < 0.5

            if no_brdf:
                l_brdf = d
                w_brdf = weight
            else:
                l_brdf = cosine_hemisphere(normal, us[1], us[2], False)
                w_brdf = weight * albedo

            if no_nee:
                l_nee = d
                w_nee = weight
            else:
                slot = pick_light_slot(total_area * us[3], areas)
                lv0, la1, la2, lnorm, _ltri = light_lookup(light_tab, slot)
                p1 = sample_triangle_point(lv0, la1, la2, us[4], us[5])
                dvec = p1 - pos
                l_nee = normalized_safe(dvec)
                light_n = Vec3.full((R,), 0.0, -1.0, 0.0)
                cos_l = jnp.maximum(0.0, dot(l_nee, normal))
                cos_o1 = jnp.maximum(0.0, dot(light_n, -l_nee))
                d2 = dot(dvec, dvec)
                g = cos_l * cos_o1 / jnp.where(d2 > 0.0, d2, 1.0)
                w_nee = weight * albedo * ((1.0 / PI_REF) * g * total_area)

            l_dir = where(brdf_branch, l_brdf, l_nee)
            new_weight = where(brdf_branch, w_brdf, w_nee)
            new_remaining = remaining - 1
            new_remaining = jnp.where(
                brdf_branch, new_remaining, jnp.minimum(new_remaining, 1))

            o = where(active, pos, o)
            d_ = where(active, l_dir, d)
            weight = where(active, new_weight, weight)
            remaining = jnp.where(active, new_remaining, remaining)
            return (o, d_, weight, accum, remaining), None

        @jax.jit
        def glue(key):
            def one(i, acc):
                keys = pixel_keys(sample_key(key, i), idx)
                o, d = camera_rays(cam, idx, keys, jitter=False)
                carry = (o, d, one_v, Vec3.zeros((R,)),
                         jnp.full((R,), 3, jnp.int32))
                carry, _ = bounce(carry, 0, keys)
                carry, _ = jax.lax.scan(
                    lambda c, b: bounce(c, b, keys), carry,
                    jnp.arange(1, 3))
                return acc + carry[3].x
            return jax.lax.fori_loop(0, S, one,
                                     jnp.zeros((R,), jnp.float32))
        return glue

    base = timed("glue ALL ON", make_glue(), key)
    timed("  - shading (const normal/albedo)", make_glue(no_shading=True),
          key)
    timed("  - uniform_sites (const us)", make_glue(no_sites=True), key)
    timed("  - brdf branch (cosine_hemisphere)", make_glue(no_brdf=True),
          key)
    timed("  - nee branch (light sample)", make_glue(no_nee=True), key)
    timed("  - hit bookkeeping", make_glue(no_book=True), key)
    timed("  minimal (all off)",
          make_glue(no_shading=True, no_sites=True, no_brdf=True,
                    no_nee=True, no_book=True), key)
    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
