"""Real trace_packets timing vs tile_size on the colonnade bounce batch."""

import functools
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
from cudapathtracer_tpu.render.camera import camera_rays, make_camera
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene
from cudapathtracer_tpu.ops.traversal import make_trace_data
from cudapathtracer_tpu.accel.bvh import as_fine

SIZE = 1024
R = SIZE * SIZE


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
    print(f"{name:52s} {best/iters*1000:8.2f} ms", flush=True)


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

    def tr(o, d, ts, rounds, frs=2):
        return packets.trace_packets(
            o, d, pdata, fine_td=td, mask=mask, tile_size=ts,
            max_clusters=4095, engine="pallas", sort=True, rounds=rounds,
            first_round_slots=frs)

    for ts in (256, 512, 1024, 2048):
        timed(f"bounce sorted r=1 P={ts}",
              functools.partial(tr, ts=ts, rounds=1), o1, d1)
    for ts in (512, 1024, 2048):
        timed(f"bounce sorted r=2 P={ts}",
              functools.partial(tr, ts=ts, rounds=2), o1, d1)
    # primary at bigger tiles too
    def trp(o, d, ts):
        return packets.trace_packets(
            o, d, pdata, fine_td=td, mask=mask, tile_size=ts,
            max_clusters=4095, engine="pallas", sort=False, rounds=1)
    for ts in (256, 1024):
        timed(f"primary unsorted r=1 P={ts}",
              functools.partial(trp, ts=ts), o0, d0)


if __name__ == "__main__":
    main()
