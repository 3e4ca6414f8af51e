"""Decompose the _sorted_rounds pipeline on the real bounce batch."""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops import packets
from cudapathtracer_tpu.ops.pallas.dense_resident import (
    dense_intersect_resident,
    pack_clusters_resident,
)
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, uniform_site
from cudapathtracer_tpu.ops.sampling import cosine_hemisphere
from cudapathtracer_tpu.ops.shading import hit_shading, make_shade_table
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays, make_camera
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.ops.traversal import make_trace_data
from cudapathtracer_tpu.accel.bvh import as_fine

SIZE = 1024
R = SIZE * SIZE
P = 256
Tl = R // P


def timed(name, fn, *args, iters=6):
    jf = jax.jit(fn)
    out = jf(*args)
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
    print(f"{name:56s} {best/iters*1000:8.2f} ms", flush=True)


def main():
    scene = procedural.to_scene(procedural.colonnade(subdiv=3))
    bvh = build_bvh_for_scene(scene, 4)
    td = make_trace_data(scene, as_fine(bvh))
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z), bvh.cl_tri)
    K, C = pdata.num_clusters, pdata.cluster_size
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=SIZE, height=SIZE,
                      focal_length=2.0)
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
        n, _, _ = hit_shading(shade_tab, None, scene.num_tris, tri, pos)
        u1 = uniform_site(keys, 3, bounce=1)
        u2 = uniform_site(keys, 4, bounce=1)
        return pos, cosine_hemisphere(n, u1, u2, False)

    o1, d1 = jax.block_until_ready(bounce_batch(o0, d0))
    mask = jnp.ones((R,), bool)

    # --- total: the new path end-to-end -----------------------------------
    def full(o, d):
        return packets.trace_packets(o, d, pdata, fine_td=td, mask=mask,
                                     tile_size=256, max_clusters=4095,
                                     engine="pallas", sort=True, rounds=2,
                                     first_round_slots=2)
    timed("NEW _sorted_rounds r=2 total", full, o1, d1)

    # --- stepwise ----------------------------------------------------------
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())

    @jax.jit
    def prep(o, d):
        kv = packets.ray_sort_keys(o, d, mask, lo, hi)
        perm = jnp.argsort(kv)
        rows = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z], axis=1)
        rows = jnp.take(rows, perm, axis=0)
        return rows

    rows = jax.block_until_ready(prep(o1, d1))
    ox = rows[:, 0].reshape(Tl, P)
    oy = rows[:, 1].reshape(Tl, P)
    oz = rows[:, 2].reshape(Tl, P)
    dx = rows[:, 3].reshape(Tl, P)
    dy = rows[:, 4].reshape(Tl, P)
    dz = rows[:, 5].reshape(Tl, P)
    cl_lo = Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
                 pdata.cl_lo.z[None, :])
    cl_hi = Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
                 pdata.cl_hi.z[None, :])

    def shortlists(live2d, M):
        b = lambda v: packets._masked_bounds(v, live2d, 1)
        olox, ohix = b(ox); oloy, ohiy = b(oy); oloz, ohiz = b(oz)
        dlox, dhix = b(dx); dloy, dhiy = b(dy); dloz, dhiz = b(dz)
        hit, entry = packets.tile_cull(
            Vec3(olox, oloy, oloz), Vec3(ohix, ohiy, ohiz),
            Vec3(dlox, dloy, dloz), Vec3(dhix, dhiy, dhiz), cl_lo, cl_hi)
        any_lane = jnp.any(live2d, axis=1, keepdims=True)
        entry = jnp.where(hit & any_lane, entry, jnp.inf)
        negv, idxs = jax.lax.top_k(-entry, M)
        entries_ = -negv
        ok = entries_ < jnp.inf
        ids_ = jnp.where(ok, idxs, K).astype(jnp.int32)
        counts_ = jnp.sum(ok, axis=1).astype(jnp.int32)
        return ids_, counts_, entries_

    m2 = jnp.ones((Tl, P), bool)
    cl_packed = jax.block_until_ready(pack_clusters_resident(pdata))
    ids, counts, entries = jax.block_until_ready(
        jax.jit(lambda: shortlists(m2, K))())

    def mk_rays16(live, t_cur, id_cur):
        return jnp.stack(
            [ox, oy, oz, dx, dy, dz, live.astype(jnp.float32), t_cur,
             id_cur.astype(jnp.float32) + float(1 << 23),
             *(jnp.zeros_like(ox) for _ in range(7))], axis=1)

    t0_ = jnp.full((Tl, P), 1e5, jnp.float32)
    id0_ = jnp.full((Tl, P), -1, jnp.int32)

    timed("cull+topk(K) full-M", lambda: shortlists(m2, K)[1])

    def round1(ids, counts, entries):
        capped = jnp.minimum(counts, 2)
        r16 = mk_rays16(m2, t0_, id0_)
        return dense_intersect_resident(ids, capped, entries, r16,
                                        cl_packed, pdata.num_tris, start=0)
    timed("round1 kernel (budget 2, NR=16)", round1, ids, counts, entries)

    t1, id1 = jax.block_until_ready(
        jax.jit(round1)(ids, counts, entries))

    @jax.jit
    def liveness(t1):
        nxt = jnp.where(counts > 2, entries[:, 2], jnp.inf)[:, None]
        return m2 & (t1 >= nxt)
    live = jax.block_until_ready(liveness(t1))
    lv = np.asarray(live)
    print(f"live rays {lv.mean():.3f}  live tiles {lv.any(1).mean():.3f}",
          flush=True)
    # miss-rays among live?
    print("t==MAXFLOAT among live rays:",
          float(np.asarray((jnp.where(live, t1, 0) >= 1e5 - 1).mean())),
          flush=True)

    ids2, counts2, entries2 = jax.block_until_ready(
        jax.jit(lambda lv_: shortlists(lv_, K))(live))
    c2 = np.asarray(counts2)
    print(f"round2 counts: mean={c2.mean():.2f} p90={np.percentile(c2,90):.0f} "
          f"max={c2.max()}", flush=True)

    def round2(ids2, counts2, entries2, live, t1, id1):
        r16 = mk_rays16(live, t1, id1)
        return dense_intersect_resident(ids2, counts2, entries2, r16,
                                        cl_packed, pdata.num_tris, start=0)
    timed("round2 kernel (full, re-culled, NR=16)", round2,
          ids2, counts2, entries2, live, t1, id1)

    # contrast: single full round NR=16
    def single(ids, counts, entries):
        r16 = mk_rays16(m2, t0_, id0_)
        return dense_intersect_resident(ids, counts, entries, r16,
                                        cl_packed, pdata.num_tris, start=0)
    timed("single full-shortlist kernel (NR=16)", single, ids, counts,
          entries)


if __name__ == "__main__":
    main()
