"""Round-5 resident-kernel decomposition on REAL shortlists.

Times dense_intersect_resident on the production sorted bounce batch with
surgically modified inputs to separate:
  - per-tile fixed cost           (counts = 0)
  - fixed + one fold per tile     (counts = min(counts, 1))
  - the real workload             (real counts/entries)
  - early-exit value              (entries = 0 disables it)
  - fast-ladder width             (fast = 1 vs 4)
  - unroll                        (4 vs 8)

Usage: python tools/prof_r5kernel.py [subdiv] [P]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops import packets
from cudapathtracer_tpu.ops.pallas import dense_resident as dr
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, uniform_site
from cudapathtracer_tpu.ops.sampling import cosine_hemisphere
from cudapathtracer_tpu.ops.shading import hit_shading, make_shade_table
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays, make_camera
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.accel.bvh import as_fine
from cudapathtracer_tpu.ops.traversal import make_trace_data

SIZE = int(os.environ.get("PROF_SIZE", "1024"))
R = SIZE * SIZE


def timed(name, fn, *args, iters=8):
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
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    csz = int(sys.argv[4]) if len(sys.argv) > 4 else None
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    bvh = build_bvh_for_scene(scene, 4, cluster_size=csz)
    td = make_trace_data(scene, as_fine(bvh))
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
        bvh.cl_tri,
    )
    K, C = pdata.num_clusters, pdata.cluster_size
    print(f"tris={scene.num_tris} K={K} C={C} P={P}", flush=True)

    cam = make_camera(pos=(0.0, 2.0, 3.4), width=SIZE, height=SIZE,
                      focal_length=2.0)
    key = jax.random.PRNGKey(1234)
    idx = jnp.arange(R, dtype=jnp.uint32)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    o0, d0 = camera_rays(cam, idx, keys, jitter=False)
    shade_tab = make_shade_table(scene)

    @jax.jit
    def bounce_batch(o0, d0):
        h = packets.trace_packets(o0, d0, pdata, fine_td=td, tile_size=P,
                                  max_clusters=4095, engine="pallas",
                                  sort=False)
        t = jnp.maximum(h.t - 1e-3, 0.0)
        pos = o0 + d0 * t
        tri = jnp.maximum(h.tri, 0)
        normal, _, _ = hit_shading(shade_tab, None, scene.num_tris, tri, pos)
        u1 = uniform_site(keys, 3, bounce=1)
        u2 = uniform_site(keys, 4, bounce=1)
        d1 = cosine_hemisphere(normal, u1, u2, False)
        return pos, d1

    o1, d1 = jax.block_until_ready(bounce_batch(o0, d0))
    mask = jnp.ones((R,), bool)
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())
    skey = packets.ray_sort_keys(o1, d1, mask, lo, hi)
    perm = jnp.argsort(skey)
    so = Vec3(o1.x[perm], o1.y[perm], o1.z[perm])
    sd = Vec3(d1.x[perm], d1.y[perm], d1.z[perm])

    Tl = R // P
    ox = so.x.reshape(Tl, P)
    oy = so.y.reshape(Tl, P)
    oz = so.z.reshape(Tl, P)
    dx = sd.x.reshape(Tl, P)
    dy = sd.y.reshape(Tl, P)
    dz = sd.z.reshape(Tl, P)

    arr = jnp.stack([ox, oy, oz, dx, dy, dz], axis=1)
    mins = jnp.min(arr, axis=2, keepdims=True)
    maxs = jnp.max(arr, axis=2, keepdims=True)
    hit, entry = packets.tile_cull(
        Vec3(mins[:, 0], mins[:, 1], mins[:, 2]),
        Vec3(maxs[:, 0], maxs[:, 1], maxs[:, 2]),
        Vec3(mins[:, 3], mins[:, 4], mins[:, 5]),
        Vec3(maxs[:, 3], maxs[:, 4], maxs[:, 5]),
        Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
             pdata.cl_lo.z[None, :]),
        Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
             pdata.cl_hi.z[None, :]))
    inf = jnp.float32(jnp.inf)
    entry = jnp.where(hit, entry, inf)
    M = K
    negv, idxs = jax.lax.top_k(-entry, M)
    entries = -negv
    slot_ok = entries < inf
    ids = jnp.where(slot_ok, idxs, K).astype(jnp.int32)
    counts = jnp.sum(slot_ok, axis=1).astype(jnp.int32)
    cnts = np.asarray(counts)
    print(f"counts: mean={cnts.mean():.2f} p50={np.percentile(cnts, 50)} "
          f"p95={np.percentile(cnts, 95)} sum={cnts.sum()}", flush=True)

    # scene-exit cap (exactly like trace_packets)
    def axis_exit(o_, d_, l_, h_):
        ds = jnp.where(jnp.abs(d_) < 1e-30,
                       jnp.where(d_ < 0, -1e-30, 1e-30), d_)
        return jnp.maximum((l_ - o_) / ds, (h_ - o_) / ds)

    cap_row = jnp.maximum(0.0, jnp.minimum(
        jnp.minimum(axis_exit(ox, dx, lo.x, hi.x),
                    axis_exit(oy, dy, lo.y, hi.y)),
        axis_exit(oz, dz, lo.z, hi.z))) * 1.0001 + 1e-4
    rays = jnp.stack([ox, oy, oz, dx, dy, dz,
                      jnp.ones((Tl, P), jnp.float32), cap_row], axis=1)
    rays = jax.block_until_ready(rays)

    packed = jax.block_until_ready(dr.pack_clusters_resident_bw(pdata))
    boxes = jax.block_until_ready(dr.pack_cluster_boxes(pdata))
    ids = jax.block_until_ready(ids)
    counts = jax.block_until_ready(counts)
    entries = jax.block_until_ready(entries)

    def run(i_, c_, e_, r_, **kw):
        return dr.dense_intersect_resident(i_, c_, e_, r_, packed, boxes,
                                           pdata.num_tris, bw=True, **kw)

    mode = sys.argv[3] if len(sys.argv) > 3 else "full"
    if mode == "full":
        timed("real workload (prod: unroll=8 fast=4)", run,
              ids, counts, entries, rays)
        timed("counts=0 (pure fixed)", run,
              ids, jnp.zeros_like(counts), entries, rays)
        timed("counts=min(c,1)", run,
              ids, jnp.minimum(counts, 1), entries, rays)
        timed("counts=min(c,4)", run,
              ids, jnp.minimum(counts, 4), entries, rays)
        timed("entries=0 (no early exit)", run,
              ids, counts, jnp.zeros_like(entries), rays)
        for u in (4, 16):
            timed(f"real, unroll={u}",
                  lambda i_, c_, e_, r_, u=u: dr.dense_intersect_resident(
                      i_, c_, e_, r_, packed, boxes, pdata.num_tris, bw=True,
                      unroll=u),
                  ids, counts, entries, rays)
        timed("real, fast=1",
              lambda i_, c_, e_, r_: dr.dense_intersect_resident(
                  i_, c_, e_, r_, packed, boxes, pdata.num_tris, bw=True,
                  fast=1),
              ids, counts, entries, rays)
    # round-5 sweep: ray-subgroup gating x warm start
    # (unroll*NS+1 <= 24 gate bits); PT_SWEEP="ns,u,w;ns,u,w;..." overrides
    sweep = ((1, 8, 0), (2, 8, 0), (1, 8, 1), (1, 8, 2), (1, 8, 4),
             (2, 8, 2), (4, 5, 2), (2, 11, 2), (1, 4, 2))
    if os.environ.get("PT_SWEEP"):
        sweep = tuple(tuple(int(x) for x in grp.split(","))
                      for grp in os.environ["PT_SWEEP"].split(";"))
    if mode == "folds":
        # ground truth: ACTUAL sub-fold counts executed per config
        # (debug_folds kernels report the per-tile count in the t row)
        for ns, u, w in sweep:
            t_, _ = dr.dense_intersect_resident(
                ids, counts, entries, rays, packed, boxes, pdata.num_tris,
                bw=True, unroll=u, ray_groups=ns, warm_start=w,
                debug_folds=True)
            fc = np.asarray(t_)[:, 0]
            print(f"NS={ns} u={u} warm={w}: subfolds sum={fc.sum():.0f} "
                  f"full-fold equiv={fc.sum() / ns:.0f} "
                  f"mean/tile={fc.mean() / ns:.2f}", flush=True)
        return

    ref_t = ref_tri = None
    for entry in sweep:
        ns, u, w = entry[:3]
        fl = bool(entry[3]) if len(entry) > 3 else False
        fn = jax.jit(lambda i_, c_, e_, r_, ns=ns, u=u, w=w, fl=fl:
                     dr.dense_intersect_resident(
                         i_, c_, e_, r_, packed, boxes, pdata.num_tris,
                         bw=True, unroll=u, ray_groups=ns, warm_start=w,
                         fold_loop=fl))
        timed(f"real, NS={ns} unroll={u} warm={w} fl={int(fl)}", fn,
              ids, counts, entries, rays)
        t_, tri_ = fn(ids, counts, entries, rays)
        if ref_t is None:
            ref_t, ref_tri = np.asarray(t_), np.asarray(tri_)
        else:
            assert np.array_equal(np.asarray(t_), ref_t), f"t mismatch {ns}"
            assert np.array_equal(np.asarray(tri_), ref_tri), f"tri {ns}"


if __name__ == "__main__":
    main()
