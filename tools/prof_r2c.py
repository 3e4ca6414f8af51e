"""Round-2 perf triage: HONEST timings (the authoritative harness).

The scan-repetition harness in prof_r2{,b}.py was invalid: XLA hoists the
loop-invariant body computation out of the scan (the carry probe prevents
DCE, not LICM), so "per-iter" numbers were one-execution/iters. Here each
measurement queues `iters` independent async dispatches of the jitted fn
and reads back only the last result: per-iter = window/iters, honest for
costs well above the per-dispatch overhead (~1 ms) and amortizing the
~33 ms tunnel readback floor.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu import RenderConfig, init_accum, make_camera
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops import packets
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, uniform_site
from cudapathtracer_tpu.ops.sampling import cosine_hemisphere
from cudapathtracer_tpu.ops.shading import hit_shading, make_shade_table
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import (
    build_bvh_for_scene,
    render_batch_jit,
)
from cudapathtracer_tpu.ops.traversal import make_trace_data
from cudapathtracer_tpu.accel.bvh import as_fine

SIZE = 1024
R = SIZE * SIZE


def timed(name, fn, *args, iters=8):
    jf = jax.jit(fn)
    out = jf(*args)  # compile
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(iters):
            out = jf(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(leaf.reshape(-1)[0]).astype(np.float32))
        best = min(best, time.time() - t0)
    per = best / iters * 1000.0
    print(f"{name:58s} {per:8.2f} ms/iter  (window {best*1000:.0f} ms x{iters})",
          flush=True)
    return per


def main():
    print("device:", jax.devices()[0], flush=True)
    desc = procedural.colonnade(subdiv=3)
    scene = procedural.to_scene(desc)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=4, integrator="pt_nee",
                       samples_per_call=4, reuse_primary_hit=True)
    bvh = build_bvh_for_scene(scene, cfg.leaf_size, cluster_size=cfg.cluster_size)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=SIZE, height=SIZE,
                      focal_length=2.0)
    td = make_trace_data(scene, as_fine(bvh))
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
        bvh.cl_tri,
    )
    K, C = pdata.num_clusters, pdata.cluster_size
    print(f"tris={scene.num_tris} K={K} C={C} R={R}", flush=True)

    key = jax.random.PRNGKey(1234)
    idx = jnp.arange(R, dtype=jnp.uint32)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    o0, d0 = camera_rays(cam, idx, keys, jitter=False)
    shade_tab = make_shade_table(scene)

    @jax.jit
    def bounce_batch(o0, d0):
        h = packets.trace_packets(o0, d0, pdata, fine_td=td, tile_size=256,
                                  max_clusters=4095, engine="pallas",
                                  sort=False)
        t = jnp.maximum(h.t - 1e-3, 0.0)
        pos = o0 + d0 * t
        tri = jnp.maximum(h.tri, 0)
        normal, albedo, emission = hit_shading(
            shade_tab, None, scene.num_tris, tri, pos)
        u1 = uniform_site(keys, 3, bounce=1)
        u2 = uniform_site(keys, 4, bounce=1)
        d1 = cosine_hemisphere(normal, u1, u2, False)
        return pos, d1

    o1, d1 = bounce_batch(o0, d0)
    o1 = jax.block_until_ready(o1)
    mask = jnp.ones((R,), bool)

    # whole-sample reference point (4 samples in one call / 4)
    st0 = init_accum(cfg)
    st = render_batch_jit(scene, bvh, cam, cfg, key, st0, 4)
    float(np.asarray(st.img.x[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st = render_batch_jit(scene, bvh, cam, cfg, key, init_accum(cfg), 4)
        float(np.asarray(st.img.x[0]))
        best = min(best, time.time() - t0)
    print(f"{'full render sample (pt_nee, reuse primary, /sample)':58s} "
          f"{best/4*1000:8.2f} ms", flush=True)

    # integrator glue pieces
    timed("pixel_keys (per-sample key derivation)",
          lambda k: pixel_keys(sample_key(k, jnp.int32(3)), idx), key)
    timed("uniform_site x8 (one bounce's random draws)",
          lambda ks: sum(uniform_site(ks, s, bounce=1) for s in range(8)),
          keys)
    timed("hit_shading (row-gather shade table)",
          lambda tri: hit_shading(shade_tab, None, scene.num_tris, tri,
                                  o1)[1].x,
          jnp.abs(jnp.arange(R, dtype=jnp.int32)) % scene.num_tris)
    timed("camera_rays", lambda k: camera_rays(cam, idx, k, jitter=False)[1].x,
          keys)

    # sort machinery
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())
    keyv = packets.ray_sort_keys(o1, d1, mask, lo, hi)
    timed("ray_sort_keys", lambda o, d: packets.ray_sort_keys(
        o, d, mask, lo, hi), o1, d1)
    timed("argsort 1M i32", lambda k: jnp.argsort(k), keyv)

    def sort_roundtrip(k, o, d):
        perm = jnp.argsort(k)
        rows = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z,
                          jnp.ones_like(o.x), jnp.zeros_like(o.x)], axis=1)
        rows = jnp.take(rows, perm, axis=0)
        inv = jnp.argsort(perm)
        res = jnp.take(rows[:, :3], inv, axis=0)
        return res

    timed("sort roundtrip (2 argsort + 2 row gathers)", sort_roundtrip,
          keyv, o1, d1)

    # trace variants (renderer-exact knobs)
    def tr(o, d, sort, rounds, engine="pallas", fb=True):
        return packets.trace_packets(
            o, d, pdata, fine_td=td if fb else None, mask=mask,
            tile_size=256, max_clusters=4095, engine=engine, sort=sort,
            rounds=rounds, first_round_slots=2)

    timed("PRIMARY unsorted r=1 (renderer primary)", functools.partial(
        tr, sort=False, rounds=1), o0, d0, iters=4)
    timed("bounce sorted r=1", functools.partial(
        tr, sort=True, rounds=1), o1, d1, iters=4)
    timed("bounce sorted r=2 (renderer bounce)", functools.partial(
        tr, sort=True, rounds=2), o1, d1, iters=4)
    timed("bounce sorted r=2 NO fallback", functools.partial(
        tr, sort=True, rounds=2, fb=False), o1, d1, iters=4)
    timed("bounce UNSORTED r=1 (for contrast)", functools.partial(
        tr, sort=False, rounds=1), o1, d1, iters=2)


if __name__ == "__main__":
    main()
