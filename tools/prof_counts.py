"""Candidate-count scaling: tile size P x sort-key composition.

For the real colonnade bounce batch, computes mean/median candidates per
tile for P in {256, 512, 1024} under (a) the current sort key (octant+
major+origin Morton) and (b) a direction-heavier key (octant + 4x4 dir
grid + origin Morton). Cost model from prof_kernel: trace_kernel_ms =
Tl * (2.2us + c_mean * slot_us(P)), slot_us = 1.55 + P*384*45/10e12*1e6.
"""

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
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key, uniform_site
from cudapathtracer_tpu.ops.sampling import cosine_hemisphere
from cudapathtracer_tpu.ops.shading import hit_shading, make_shade_table
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.render.camera import make_camera
from cudapathtracer_tpu.ops.traversal import make_trace_data
from cudapathtracer_tpu.accel.bvh import as_fine

SIZE = 1024
R = SIZE * SIZE


def main():
    scene = procedural.to_scene(procedural.colonnade(subdiv=3))
    bvh = build_bvh_for_scene(scene, 4)
    td = make_trace_data(scene, as_fine(bvh))
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
        bvh.cl_tri,
    )
    K, C = pdata.num_clusters, pdata.cluster_size
    print(f"K={K} C={C}", flush=True)
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
        normal, _, _ = hit_shading(shade_tab, None, scene.num_tris, tri, pos)
        u1 = uniform_site(keys, 3, bounce=1)
        u2 = uniform_site(keys, 4, bounce=1)
        d1 = cosine_hemisphere(normal, u1, u2, False)
        return pos, d1

    o1, d1 = jax.block_until_ready(bounce_batch(o0, d0))
    mask = jnp.ones((R,), bool)
    lo = Vec3(pdata.cl_lo.x.min(), pdata.cl_lo.y.min(), pdata.cl_lo.z.min())
    hi = Vec3(pdata.cl_hi.x.max(), pdata.cl_hi.y.max(), pdata.cl_hi.z.max())

    def key_current(o, d):
        return packets.ray_sort_keys(o, d, mask, lo, hi)

    def key_dir_heavy(o, d, dir_bits=2, morton_bits=7):
        # octant (3) + per-octant dir grid (2*dir_bits) + origin morton
        oct_ = ((d.x < 0).astype(jnp.int32) * 4
                + (d.y < 0).astype(jnp.int32) * 2
                + (d.z < 0).astype(jnp.int32))
        ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
        # quantize the two minor/major ratios
        m = jnp.maximum(ax, jnp.maximum(ay, az))
        gx = jnp.clip((ax / m) * ((1 << dir_bits) - 0.001), 0,
                      (1 << dir_bits) - 1).astype(jnp.int32)
        gy = jnp.clip((ay / m) * ((1 << dir_bits) - 0.001), 0,
                      (1 << dir_bits) - 1).astype(jnp.int32)
        def q(v, l, h, bits):
            ext = jnp.maximum(h - l, 1e-20)
            return jnp.clip((v - l) / ext * ((1 << bits) - 0.001), 0,
                            (1 << bits) - 1).astype(jnp.int32)
        mb = morton_bits
        mx = packets._part1by2(q(o.x, lo.x, hi.x, mb))
        my = packets._part1by2(q(o.y, lo.y, hi.y, mb))
        mz = packets._part1by2(q(o.z, lo.z, hi.z, mb))
        morton = (mx << 2) | (my << 1) | mz
        k = (((oct_ << (2 * dir_bits)) | (gx << dir_bits) | gy)
             << (3 * mb)) | morton
        return k

    def counts_for(keyv, P: int):
        perm = jnp.argsort(keyv)
        rows = jnp.stack([o1.x, o1.y, o1.z, d1.x, d1.y, d1.z], axis=1)
        rows = jnp.take(rows, perm, axis=0)
        Tl = R // P
        rsh = lambda c: rows[:, c].reshape(Tl, P)
        m = jnp.ones((Tl, P), bool)
        b = lambda v: packets._masked_bounds(v, m, 1)
        olo_, ohi_ = zip(*(b(rsh(c)) for c in range(3)))
        dlo_, dhi_ = zip(*(b(rsh(c)) for c in range(3, 6)))
        cl_lo = Vec3(pdata.cl_lo.x[None, :], pdata.cl_lo.y[None, :],
                     pdata.cl_lo.z[None, :])
        cl_hi = Vec3(pdata.cl_hi.x[None, :], pdata.cl_hi.y[None, :],
                     pdata.cl_hi.z[None, :])
        hit, entry = packets.tile_cull(
            Vec3(*olo_), Vec3(*ohi_), Vec3(*dlo_), Vec3(*dhi_),
            cl_lo, cl_hi)
        return jnp.sum(hit, axis=1)

    for name, kf in (("current", key_current),
                     ("dir2x2+m7", lambda o, d: key_dir_heavy(o, d, 2, 7)),
                     ("dir3x3+m6", lambda o, d: key_dir_heavy(o, d, 3, 6)),
                     ("dir4x4+m5", lambda o, d: key_dir_heavy(o, d, 4, 5))):
        keyv = kf(o1, d1)
        for P in (256, 512, 1024):
            import functools
            c = np.asarray(jax.jit(functools.partial(counts_for, P=P))(keyv))
            Tl = R // P
            slot_us = 1.55 + P * C * 45 / 10e12 * 1e6
            model_ms = Tl * (2.2 + c.mean() * slot_us) / 1000.0
            print(f"{name:12s} P={P:5d}: cand mean={c.mean():6.2f} "
                  f"p50={np.percentile(c,50):4.0f} p90={np.percentile(c,90):4.0f} "
                  f"model={model_ms:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
