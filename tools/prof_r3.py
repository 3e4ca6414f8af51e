"""Round-3 kernel-shape sweep: tile size / unroll / sort window / rounds.

Times ONE sorted bounce trace (the dominant cost: 2 of these per pt_nee
sample = ~68% of sample time at 20k tris) under the honest async-dispatch
harness of prof_r2c.py (queue N dispatches, one readback). The bounce-ray
batch is generated exactly like the renderer's (primary hit + cosine
bounce), so tile tightness matches production.

Usage: python tools/prof_r3.py [subdiv]   (default 3 = 20k tris)
Knobs swept are listed in CONFIGS below.
"""

import functools
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

# (label, tile_size, unroll(None=auto), sort_window, rounds, cluster_size)
# round-3 measured: windowed sort LOSES at 20k (22.7 vs 26.0 Mrays/s end to
# end at W=128k — looser tiles cost more kernel time than the sort saves);
# rounds=2 loses post-box-gate (68 vs 57 ms/trace). Sweep P x unroll.
# NOTE on 328k scales: C<=512 gives K>=917 -> two-level cull auto-ON with a
# 128-candidate expansion cap -> chronic U-bound drops -> ~all rays hit the
# per-ray fine-BVH fallback (measured 53 s/trace at C=256!). Keep K < 512
# (C=1024) at sponza scale so the flat cull drops nothing.
CONFIGS = [
    ("P128 u4 r1 C=adaptive", 128, 4, 0, 1, None),
    ("P128 u2 r1 C=adaptive", 128, 2, 0, 1, None),
    ("P128 u8 r1 C=adaptive", 128, 8, 0, 1, None),
    ("P64 u4 r1 C=adaptive", 64, 4, 0, 1, None),
    ("P128 u4 r2 C=adaptive", 128, 4, 0, 2, None),
    ("P128 u4 r1 C=128", 128, 4, 0, 1, 128),
    ("P128 u4 r1 C=512", 128, 4, 0, 1, 512),
]


def timed(name, fn, *args, iters=4):
    out = fn(*args)  # compile
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
    print(f"{name:28s} {per:8.2f} ms/trace", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    configs = [c for c in CONFIGS
               if subdiv < 5 or c[5] in (None, 1024)]  # see NOTE above
    print("device:", jax.devices()[0], flush=True)
    desc = procedural.colonnade(subdiv=subdiv)
    scene = procedural.to_scene(desc)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=4, integrator="pt_nee",
                       samples_per_call=4, reuse_primary_hit=True)

    csizes = sorted({c[5] for c in configs},
                    key=lambda c: (c is None, c or 0))
    for csize in csizes:
        bvh = build_bvh_for_scene(scene, cfg.leaf_size, cluster_size=csize)
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
                                      tile_size=256, max_clusters=4095,
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

        o1, d1 = bounce_batch(o0, d0)
        o1 = jax.block_until_ready(o1)
        mask = jnp.ones((R,), bool)

        orig = dr.dense_intersect_resident
        for (label, P, unroll, W, rounds, cs) in configs:
            if cs != csize:
                continue
            if unroll is not None:
                dr.dense_intersect_resident = functools.partial(
                    orig, unroll=unroll)
            try:
                fn = jax.jit(functools.partial(
                    packets.trace_packets, pd=pdata, fine_td=td, mask=mask,
                    tile_size=P, max_clusters=4095, engine="pallas",
                    sort=True, rounds=rounds, first_round_slots=2,
                    sort_window=W))
                timed(label, lambda o, d: fn(o, d), o1, d1)
            except Exception as e:  # e.g. Mosaic VMEM overflow at big P*C
                print(f"{label:28s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
            finally:
                dr.dense_intersect_resident = orig


if __name__ == "__main__":
    main()
