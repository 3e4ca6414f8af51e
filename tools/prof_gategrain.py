"""Round-5 gate-granularity analysis: how much of the dense fold is wasted
on rays that fail the per-ray box test?

The resident kernel folds a full (P, C) block whenever ANY of the P rays
passes the per-slot box gate (dense_resident._box_hit_row -> any-lane OR in
the bitmask). If the per-ray pass rate is low, gating at a finer ray-group
granularity (halves / quarters of the tile) would skip a proportional
share of the fold work -- at the price of more lax.cond branches.

For the REAL sorted bounce batch (the production workload), this computes
per tile-slot the per-ray box-hit verdict using each ray's FINAL closest t
as the search interval (the optimistic bound: the kernel's running t_best
only shrinks toward it), then reports the total fold cost in (ray-group x
C) units under any-128 / any-64 / any-32 / any-8 / per-ray gating. The
any-128 number reproduces what the kernel pays today (modulo early-exit
timing); per-ray is the unreachable floor.

Usage: python tools/prof_gategrain.py [subdiv] [P] [C]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops import packets
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


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    cluster = int(sys.argv[3]) if len(sys.argv) > 3 else None
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    bvh = build_bvh_for_scene(scene, 4, cluster_size=cluster)
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

    engine = os.environ.get("PROF_ENGINE", "pallas")

    @jax.jit
    def bounce_batch(o0, d0):
        h = packets.trace_packets(o0, d0, pdata, fine_td=td, tile_size=P,
                                  max_clusters=4095, engine=engine,
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

    # production sort
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())
    skey = packets.ray_sort_keys(o1, d1, mask, lo, hi)
    perm = jnp.argsort(skey)
    so = Vec3(o1.x[perm], o1.y[perm], o1.z[perm])
    sd = Vec3(d1.x[perm], d1.y[perm], d1.z[perm])

    # final closest t per sorted ray (optimistic per-ray interval cap)
    hfin = jax.jit(lambda o, d: packets.trace_packets(
        o, d, pdata, fine_td=td, tile_size=P, max_clusters=4095,
        engine=engine, sort=False))(so, sd)
    tfin = jnp.asarray(hfin.t)

    Tl = R // P
    ox = so.x.reshape(Tl, P)
    oy = so.y.reshape(Tl, P)
    oz = so.z.reshape(Tl, P)
    dx = sd.x.reshape(Tl, P)
    dy = sd.y.reshape(Tl, P)
    dz = sd.z.reshape(Tl, P)
    tcap = tfin.reshape(Tl, P)

    # shortlists exactly like trace_packets' flat path
    arr = jnp.stack([ox, oy, oz, dx, dy, dz], axis=1)
    mins = jnp.min(arr, axis=2, keepdims=True)
    maxs = jnp.max(arr, axis=2, keepdims=True)
    olo = Vec3(mins[:, 0], mins[:, 1], mins[:, 2])
    ohi = Vec3(maxs[:, 0], maxs[:, 1], maxs[:, 2])
    dlo = Vec3(mins[:, 3], mins[:, 4], mins[:, 5])
    dhi = Vec3(maxs[:, 3], maxs[:, 4], maxs[:, 5])
    cl_lo = Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
                 pdata.cl_lo.z[None, :])
    cl_hi = Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
                 pdata.cl_hi.z[None, :])
    hit, entry = packets.tile_cull(olo, ohi, dlo, dhi, cl_lo, cl_hi)
    inf = jnp.float32(jnp.inf)
    entry = jnp.where(hit, entry, inf)
    M = K
    negv, ids = jax.lax.top_k(-entry, M)
    entries = -negv
    slot_ok = entries < inf

    def _inv(d_):
        return 1.0 / jnp.where(jnp.abs(d_) < 1e-30,
                               jnp.where(d_ < 0, -1e-30, 1e-30), d_)

    idx_, idy_, idz_ = _inv(dx), _inv(dy), _inv(dz)

    blox = pdata.cl_lo.x
    bloy = pdata.cl_lo.y
    bloz = pdata.cl_lo.z
    bhix = pdata.cl_hi.x
    bhiy = pdata.cl_hi.y
    bhiz = pdata.cl_hi.z

    @jax.jit
    def stats():
        def one_slot(carry, s):
            sums = carry
            sid = ids[:, s]                         # (Tl,)
            ok = slot_ok[:, s]                      # (Tl,)

            def b(v):
                return jnp.take(v, sid)[:, None]    # (Tl, 1)

            tx0 = (b(blox) - ox) * idx_
            tx1 = (b(bhix) - ox) * idx_
            ty0 = (b(bloy) - oy) * idy_
            ty1 = (b(bhiy) - oy) * idy_
            tz0 = (b(bloz) - oz) * idz_
            tz1 = (b(bhiz) - oz) * idz_
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            h = (tmin <= tmax) & (tmax >= 0.0) & (tmin <= tcap)  # (Tl, P)
            h = h & ok[:, None]

            def grp(n):
                # number of n-ray groups with >= 1 passing ray, x (n/P)
                # -> fold cost in units of one full (P, C) fold
                g = jnp.any(h.reshape(Tl, P // n, n), axis=2)
                return jnp.sum(g) * (n / P)

            add = jnp.stack([
                grp(P),                      # today's any-P gating
                grp(64) if P >= 64 else grp(P),
                grp(32) if P >= 32 else grp(P),
                grp(8),
                jnp.sum(h) / P,              # per-ray floor
            ])
            return sums + add, None

        init = jnp.zeros((5,), jnp.float32)
        out, _ = jax.lax.scan(one_slot, init, jnp.arange(M))
        return out

    s = np.asarray(stats())
    names = ["any-128(today)", "any-64", "any-32", "any-8", "per-ray floor"]
    base = s[0]
    print(f"fold cost in full-(P,C)-fold units, total over {Tl} tiles:")
    for n, v in zip(names, s):
        print(f"  {n:16s} {v:10.0f}   ({v / base * 100:5.1f}% of today)",
              flush=True)
    print(f"tests/ray today: {base * P * C / R:.0f}  "
          f"floor: {s[4] * P * C / R:.0f}", flush=True)


if __name__ == "__main__":
    main()
