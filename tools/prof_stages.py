"""Round-3 per-stage decomposition of one sorted bounce trace.

Times, on a REAL bounce-ray batch (generated like the renderer's):
  1. the full sorted trace (the production path)
  2. the forward payload sort alone
  3. the back (un-sort) payload sort alone
  4. trace with sort=False on the pre-sorted rays (bounds+cull+topk+kernel)
  5. bounds + cull + top_k alone (shortlist construction)
  6. the resident kernel alone on the real shortlists
  7. the fallback population (how many rays re-trace through the fine BVH)

Honest async-dispatch timing (see prof_r2c.py). Usage:
  python tools/prof_stages.py [subdiv]   (3 = 20k tris, 5 = 328k)
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
from cudapathtracer_tpu.ops import packets
from cudapathtracer_tpu.ops.pallas import dense_resident as dr
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, uniform_site
from cudapathtracer_tpu.ops.sampling import cosine_hemisphere
from cudapathtracer_tpu.ops.shading import hit_shading, make_shade_table
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.accel.bvh import as_fine
from cudapathtracer_tpu.ops.traversal import make_trace_data

SIZE = 1024
R = SIZE * SIZE
P = 128


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
    cfg = RenderConfig(width=SIZE, height=SIZE)
    bvh = build_bvh_for_scene(scene, cfg.leaf_size)
    td = make_trace_data(scene, as_fine(bvh))
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
        bvh.cl_tri,
    )
    K, C = pdata.num_clusters, pdata.cluster_size
    print(f"tris={scene.num_tris} K={K} C={C} "
          f"resident={dr.resident_fits(K, C)}", flush=True)

    key = jax.random.PRNGKey(1234)
    idx = jnp.arange(R, dtype=jnp.uint32)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=SIZE, height=SIZE,
                      focal_length=2.0)
    o0, d0 = camera_rays(cam, idx, keys, jitter=False)
    shade_tab = make_shade_table(scene)

    @jax.jit
    def bounce_batch(o0, d0):
        h = packets.trace_packets(o0, d0, pdata, fine_td=td,
                                  tile_size=P, max_clusters=4095,
                                  engine="pallas", sort=False)
        t = jnp.maximum(h.t - 1e-3, 0.0)
        pos = o0 + d0 * t
        tri = jnp.maximum(h.tri, 0)
        normal, _, _ = hit_shading(shade_tab, None, scene.num_tris,
                                   tri, pos)
        u1 = uniform_site(keys, 3, bounce=1)
        u2 = uniform_site(keys, 4, bounce=1)
        d1 = cosine_hemisphere(normal, u1, u2, False)
        return pos, d1

    o1, d1 = jax.block_until_ready(bounce_batch(o0, d0))
    mask = jnp.ones((R,), bool)

    # 1. full sorted trace
    full = jax.jit(lambda o, d: packets.trace_packets(
        o, d, pdata, fine_td=td, mask=mask, tile_size=P,
        max_clusters=4095, engine="pallas", sort=True))
    timed("full sorted trace", full, o1, d1)

    # 2. forward payload sort alone
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())

    @jax.jit
    def fwd_sort(o, d):
        kk = packets.ray_sort_keys(o, d, mask, lo, hi)
        iota = jnp.arange(R, dtype=jnp.int32)
        cols = (kk, iota, o.x, o.y, o.z, d.x, d.y, d.z,
                mask.astype(jnp.float32), jnp.zeros_like(o.x))
        return jax.lax.sort(cols, num_keys=1, is_stable=False)

    scols = jax.block_until_ready(fwd_sort(o1, d1))
    timed("forward payload sort (10 cols)", fwd_sort, o1, d1)

    (_, sidx, sox, soy, soz, sdx, sdy, sdz, smask, _) = scols
    so = Vec3(sox, soy, soz)
    sd = Vec3(sdx, sdy, sdz)

    # 3. back sort alone
    tt = jnp.abs(sox)
    ii = jnp.arange(R, dtype=jnp.int32)

    @jax.jit
    def back_sort(si, t_, i_):
        return jax.lax.sort((si, t_, i_), num_keys=1, is_stable=False)

    timed("back payload sort (3 cols)", back_sort, sidx, tt, ii)

    # 4. trace with sort=False on pre-sorted rays
    nosort = jax.jit(lambda o, d: packets.trace_packets(
        o, d, pdata, fine_td=td, mask=smask > 0.5, tile_size=P,
        max_clusters=4095, engine="pallas", sort=False))
    timed("pre-sorted trace (cull+kernel+finish)", nosort, so, sd)

    # 5. shortlist construction alone (bounds + cull + top_k), flat path
    M = min(4095, K)

    @jax.jit
    def shortlist(o, d):
        m = (smask > 0.5).reshape(-1, P)
        ox = o.x.reshape(-1, P)
        oy = o.y.reshape(-1, P)
        oz = o.z.reshape(-1, P)
        dx = d.x.reshape(-1, P)
        dy = d.y.reshape(-1, P)
        dz = d.z.reshape(-1, P)
        arr = jnp.stack([ox, oy, oz, dx, dy, dz], axis=1)
        m3 = m[:, None, :]
        inf_ = jnp.float32(jnp.inf)
        mins = jnp.min(jnp.where(m3, arr, inf_), axis=2, keepdims=True)
        maxs = jnp.max(jnp.where(m3, arr, -inf_), axis=2, keepdims=True)
        olo = Vec3(mins[:, 0], mins[:, 1], mins[:, 2])
        ohi = Vec3(maxs[:, 0], maxs[:, 1], maxs[:, 2])
        dlo = Vec3(mins[:, 3], mins[:, 4], mins[:, 5])
        dhi = Vec3(maxs[:, 3], maxs[:, 4], maxs[:, 5])
        cl_lo = Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
                     pdata.cl_lo.z[None, :])
        cl_hi = Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
                     pdata.cl_hi.z[None, :])
        hit, entry = packets.tile_cull(olo, ohi, dlo, dhi, cl_lo, cl_hi)
        any_lane = jnp.any(m, axis=1, keepdims=True)
        entry = jnp.where(hit & any_lane, entry, inf_)
        if K > M:
            negv, idxs = jax.lax.top_k(-entry, M + 1)
            negv = negv[:, :M]
            idxs = idxs[:, :M]
        else:
            negv, idxs = jax.lax.top_k(-entry, M)
        entries = -negv
        slot_ok = entries < inf_
        ids = jnp.where(slot_ok, idxs, K).astype(jnp.int32)
        counts = jnp.sum(slot_ok, axis=1).astype(jnp.int32)
        return ids, counts, entries

    ids, counts, entries = jax.block_until_ready(shortlist(so, sd))
    timed("shortlist (bounds+cull+top_k)", shortlist, so, sd)
    cnts = np.asarray(counts)
    print(f"  counts: mean={cnts.mean():.2f} p50={np.percentile(cnts, 50)} "
          f"p95={np.percentile(cnts, 95)} max={cnts.max()}", flush=True)

    # 6. resident kernel alone on the real shortlists
    Tl = R // P
    ox = so.x.reshape(Tl, P)
    oy = so.y.reshape(Tl, P)
    oz = so.z.reshape(Tl, P)
    dx = sd.x.reshape(Tl, P)
    dy = sd.y.reshape(Tl, P)
    dz = sd.z.reshape(Tl, P)
    mrow = smask.reshape(Tl, P)
    cap = jnp.full((Tl, P), 1e5, jnp.float32)
    rays = jnp.stack([ox, oy, oz, dx, dy, dz, mrow, cap], axis=1)
    packed = jax.block_until_ready(dr.pack_clusters_resident_bw(pdata))
    boxes = jax.block_until_ready(dr.pack_cluster_boxes(pdata))
    if dr.resident_fits(K, C):
        timed("resident kernel alone (real shortlists)",
              lambda i_, c_, e_, r_: dr.dense_intersect_resident(
                  i_, c_, e_, r_, packed, boxes, pdata.num_tris, bw=True),
              ids, counts, entries, rays)

    # 6b. pack cost (runs inside every trace dispatch)
    timed("pack_clusters_resident_bw",
          jax.jit(dr.pack_clusters_resident_bw), pdata)

    # 7. fallback population
    hit_ns, need = jax.jit(lambda o, d: packets.trace_packets(
        o, d, pdata, fine_td=None, mask=smask > 0.5, tile_size=P,
        max_clusters=4095, engine="pallas", sort=False,
        _need_out=True))(so, sd)
    nfb = int(jnp.sum(need))
    print(f"  fallback rays: {nfb} / {R} ({100.0 * nfb / R:.3f}%)",
          flush=True)


if __name__ == "__main__":
    main()
