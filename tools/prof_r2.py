"""Round-2 perf triage: where does the 260 ms/sample actually go?

Times each stage of the packet-traversal pipeline on the real TPU with
in-dispatch repetition (lax.scan of ITERS reps inside one jit) so the
~33 ms dispatch+readback floor of the tunnel doesn't pollute sub-floor
measurements. All numbers are per-iteration.

Run: python tools/prof_r2.py
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
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import (
    build_bvh_for_scene,
    make_trace_fn,
    render_batch_jit,
)
from cudapathtracer_tpu.ops.traversal import make_trace_data
from cudapathtracer_tpu.accel.bvh import as_fine

SIZE = 1024
R = SIZE * SIZE


def timed(name, fn, *args, iters=8):
    """Time fn(*args) repeated `iters` times inside ONE jit dispatch."""

    @jax.jit
    def rep(*a):
        def body(carry, _):
            out = fn(*a)
            # fold a scalar of the output into the carry so the scan body
            # cannot be hoisted/CSE'd away
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = leaf.reshape(-1)[0].astype(jnp.float32)
            return carry + probe, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    # compile + warm
    float(np.asarray(rep(*args)))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(np.asarray(rep(*args)))
        best = min(best, time.time() - t0)
    per = (best) / iters * 1000.0
    print(f"{name:55s} {per:8.2f} ms/iter   (window {best*1000:.1f} ms)")
    return per


def main():
    print("device:", jax.devices()[0])
    desc = procedural.colonnade(subdiv=3)
    scene = procedural.to_scene(desc)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp=1, integrator="pt_nee",
                       samples_per_call=1, reuse_primary_hit=True)
    bvh = build_bvh_for_scene(scene, cfg.leaf_size, cluster_size=cfg.cluster_size)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=SIZE, height=SIZE,
                      focal_length=2.0)
    trace_fn, _ = make_trace_fn(scene, cfg, bvh)
    td = make_trace_data(scene, as_fine(bvh))
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
        bvh.cl_tri,
    )
    K = pdata.num_clusters
    C = pdata.cluster_size
    print(f"scene tris={scene.num_tris} K={K} C={C} R={R}")

    # --- representative bounce batch: primary hits + cosine bounce ---------
    key = jax.random.PRNGKey(1234)
    idx = jnp.arange(R, dtype=jnp.uint32)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    o0, d0 = camera_rays(cam, idx, keys, jitter=False)

    @jax.jit
    def bounce_batch(o0, d0):
        h = packets.trace_packets(o0, d0, pdata, fine_td=td, tile_size=256,
                                  max_clusters=32, engine="pallas", sort=False)
        t = jnp.maximum(h.t - 1e-3, 0.0)
        pos = o0 + d0 * t
        # crude normal-free cosine bounce: random directions per lane
        u1 = uniform_site(keys, 3, bounce=1)
        u2 = uniform_site(keys, 4, bounce=1)
        n = Vec3(jnp.zeros((R,)), jnp.ones((R,)), jnp.zeros((R,)))
        d1 = cosine_hemisphere(n, u1, u2, False)
        return pos, d1

    o1, d1 = bounce_batch(o0, d0)
    o1 = jax.block_until_ready(o1)
    mask = jnp.ones((R,), bool)

    # --- 0. whole-sample reference point ------------------------------------
    st = render_batch_jit(scene, bvh, cam, cfg, key, init_accum(cfg), 1)
    float(np.asarray(st.img.x[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st = render_batch_jit(scene, bvh, cam, cfg, key, init_accum(cfg), 1)
        float(np.asarray(st.img.x[0]))
        best = min(best, time.time() - t0)
    print(f"{'full render sample (pt_nee, reuse primary)':55s} {best*1000:8.2f} ms")

    # --- 1. sort machinery ---------------------------------------------------
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())
    keyv = packets.ray_sort_keys(o1, d1, mask, lo, hi)

    timed("argsort 1M i32 keys", lambda k: jnp.argsort(k), keyv, iters=4)

    def sort_roundtrip(k, ox):
        perm = jnp.argsort(k)
        rows = jnp.stack([ox] * 8, axis=1)
        rows = jnp.take(rows, perm, axis=0)
        inv = jnp.argsort(perm)
        res = jnp.take(rows[:, :2], inv, axis=0)
        return res

    timed("full sort roundtrip (2 argsorts + 2 row gathers)",
          sort_roundtrip, keyv, o1.x, iters=4)

    timed("ray_sort_keys only",
          lambda o, d: packets.ray_sort_keys(o, d, mask, lo, hi),
          o1, d1, iters=8)

    # --- 2. cull + topk ------------------------------------------------------
    def cull_topk(ox):
        o = Vec3(ox, o1.y, o1.z)
        P = 256
        Tl = R // P
        m = jnp.ones((Tl, P), bool)
        def rsh(v):
            return v.reshape(Tl, P)
        olo, ohi = packets._masked_bounds(rsh(o.x), m, 1)
        olo2, ohi2 = packets._masked_bounds(rsh(o1.y), m, 1)
        olo3, ohi3 = packets._masked_bounds(rsh(o1.z), m, 1)
        dlo, dhi = packets._masked_bounds(rsh(d1.x), m, 1)
        dlo2, dhi2 = packets._masked_bounds(rsh(d1.y), m, 1)
        dlo3, dhi3 = packets._masked_bounds(rsh(d1.z), m, 1)
        cl_lo = Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
                     pdata.cl_lo.z[None, :])
        cl_hi = Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
                     pdata.cl_hi.z[None, :])
        hit, entry = packets.tile_cull(
            Vec3(olo, olo2, olo3), Vec3(ohi, ohi2, ohi3),
            Vec3(dlo, dlo2, dlo3), Vec3(dhi, dhi2, dhi3), cl_lo, cl_hi)
        entry = jnp.where(hit, entry, jnp.inf)
        negv, idxs = jax.lax.top_k(-entry, 33)
        return negv

    timed(f"tile bounds + cull + top_k(33) over K={K}", cull_topk, o1.x,
          iters=8)

    # --- 3. trace variants ---------------------------------------------------
    def tr(o, d, sort, rounds, engine="pallas"):
        return packets.trace_packets(
            o, d, pdata, fine_td=td, mask=mask, tile_size=256,
            max_clusters=32, engine=engine, sort=sort, rounds=rounds,
            first_round_slots=2)

    timed("trace bounce batch  unsorted r=1", functools.partial(
        tr, sort=False, rounds=1), o1, d1, iters=4)
    timed("trace bounce batch  sorted   r=1", functools.partial(
        tr, sort=True, rounds=1), o1, d1, iters=4)
    timed("trace bounce batch  sorted   r=2", functools.partial(
        tr, sort=True, rounds=2), o1, d1, iters=4)
    timed("trace PRIMARY batch unsorted r=1", functools.partial(
        tr, sort=False, rounds=1), o0, d0, iters=4)

    # --- 4. xla engine for contrast ------------------------------------------
    timed("trace bounce batch  sorted   r=1 (xla engine)", functools.partial(
        tr, sort=True, rounds=1, engine="xla"), o1, d1, iters=2)


if __name__ == "__main__":
    main()
