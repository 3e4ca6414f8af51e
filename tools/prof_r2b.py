"""Round-2 perf triage, part 2: renderer-exact knobs (max_clusters=4095).

Times trace_packets variants exactly as render_batch invokes them, plus the
dense kernel in isolation, to split the 350 ms/sample between sort / cull /
kernel / fallback / integrator glue.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu import RenderConfig, make_camera
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops import packets
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, uniform_site
from cudapathtracer_tpu.ops.sampling import cosine_hemisphere
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.ops.traversal import make_trace_data
from cudapathtracer_tpu.accel.bvh import as_fine

SIZE = 1024
R = SIZE * SIZE


def timed(name, fn, *args, iters=4):
    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.reshape(-1)[0].astype(jnp.float32)
            return carry + probe, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    float(np.asarray(rep(*args)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(rep(*args)))
        best = min(best, time.time() - t0)
    per = best / iters * 1000.0
    print(f"{name:58s} {per:8.2f} ms/iter", flush=True)
    return per


def main():
    print("device:", jax.devices()[0], flush=True)
    desc = procedural.colonnade(subdiv=3)
    scene = procedural.to_scene(desc)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=1, integrator="pt_nee",
                       samples_per_call=1, reuse_primary_hit=True)
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

    # realistic bounce batch: cosine bounce about the TRUE surface normal
    from cudapathtracer_tpu.ops.shading import hit_shading, make_shade_table
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

    def tr(o, d, sort, rounds, mc=4095, engine="pallas", fb=True):
        return packets.trace_packets(
            o, d, pdata, fine_td=td if fb else None, mask=mask,
            tile_size=256, max_clusters=mc, engine=engine, sort=sort,
            rounds=rounds, first_round_slots=2)

    timed("PRIMARY unsorted r=1 mc=4095 (renderer primary)", functools.partial(
        tr, sort=False, rounds=1), o0, d0)
    timed("bounce sorted r=2 mc=4095 (renderer bounce)", functools.partial(
        tr, sort=True, rounds=2), o1, d1)
    timed("bounce sorted r=1 mc=4095", functools.partial(
        tr, sort=True, rounds=1), o1, d1)
    timed("bounce sorted r=1 mc=4095 NO fallback", functools.partial(
        tr, sort=True, rounds=1, fb=False), o1, d1)
    timed("bounce sorted r=2 mc=4095 NO fallback", functools.partial(
        tr, sort=True, rounds=2, fb=False), o1, d1)

    # kernel alone on the sorted bounce batch shortlists
    from cudapathtracer_tpu.ops.pallas.dense_resident import (
        dense_intersect_resident, pack_clusters_resident)

    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())

    @jax.jit
    def prep(o, d):
        keyv = packets.ray_sort_keys(o, d, mask, lo, hi)
        perm = jnp.argsort(keyv)
        rows = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z,
                          jnp.ones_like(o.x), jnp.zeros_like(o.x)], axis=1)
        rows = jnp.take(rows, perm, axis=0)
        P = 256
        Tl = R // P
        os_ = Vec3(rows[:, 0], rows[:, 1], rows[:, 2])
        ds_ = Vec3(rows[:, 3], rows[:, 4], rows[:, 5])
        m = jnp.ones((Tl, P), bool)
        rsh = lambda v: v.reshape(Tl, P)
        olox, ohix = packets._masked_bounds(rsh(os_.x), m, 1)
        oloy, ohiy = packets._masked_bounds(rsh(os_.y), m, 1)
        oloz, ohiz = packets._masked_bounds(rsh(os_.z), m, 1)
        dlox, dhix = packets._masked_bounds(rsh(ds_.x), m, 1)
        dloy, dhiy = packets._masked_bounds(rsh(ds_.y), m, 1)
        dloz, dhiz = packets._masked_bounds(rsh(ds_.z), m, 1)
        cl_lo = Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
                     pdata.cl_lo.z[None, :])
        cl_hi = Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
                     pdata.cl_hi.z[None, :])
        hit, entry = packets.tile_cull(
            Vec3(olox, oloy, oloz), Vec3(ohix, ohiy, ohiz),
            Vec3(dlox, dloy, dloz), Vec3(dhix, dhiy, dhiz), cl_lo, cl_hi)
        entry = jnp.where(hit, entry, jnp.inf)
        negv, idxs = jax.lax.top_k(-entry, K)
        entries = -negv
        slot_ok = entries < jnp.inf
        ids = jnp.where(slot_ok, idxs, K).astype(jnp.int32)
        counts = jnp.sum(slot_ok, axis=1).astype(jnp.int32)
        rays = jnp.stack([rsh(os_.x), rsh(os_.y), rsh(os_.z),
                          rsh(ds_.x), rsh(ds_.y), rsh(ds_.z),
                          jnp.ones((Tl, P)), jnp.zeros((Tl, P))], axis=1)
        return ids, counts, entries, rays

    ids, counts, entries, rays = jax.block_until_ready(prep(o1, d1))
    cl_packed = jax.block_until_ready(pack_clusters_resident(pdata))
    cnp = np.asarray(counts)
    print(f"candidates/tile: mean={cnp.mean():.1f} p50={np.percentile(cnp,50):.0f} "
          f"p90={np.percentile(cnp,90):.0f} max={cnp.max()}", flush=True)

    timed("dense_resident kernel alone (sorted bounce shortlists)",
          lambda i_, c_, e_, r_: dense_intersect_resident(
              i_, c_, e_, r_, cl_packed, pdata.num_tris),
          ids, counts, entries, rays)

    # primary shortlists for contrast
    ids0, counts0, entries0, rays0 = jax.block_until_ready(prep(o0, d0))
    timed("dense_resident kernel alone (primary shortlists)",
          lambda i_, c_, e_, r_: dense_intersect_resident(
              i_, c_, e_, r_, cl_packed, pdata.num_tris),
          ids0, counts0, entries0, rays0)


if __name__ == "__main__":
    main()
