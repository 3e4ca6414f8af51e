"""Round-4 sweep: sorted bounce-trace time across {two_level mode, C,
sort_window, super_factor} on a real bounce batch (like prof_stages).

Usage: python tools/prof_r4.py [subdiv] [configs...]
Each config is  mode:C:sortwin:F   e.g.  super:256:16384:8  flat:256:0:8
(mode: flat | two | super | auto). Honest async-dispatch timing.
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
P = int(os.environ.get("PROF_P", "128"))

MODE = {"flat": False, "two": True, "super": "super", "auto": None}


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
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    configs = sys.argv[2:] or [
        "auto:0:0:8", "super:256:0:8", "super:256:16384:8",
        "super:512:16384:8", "super:256:16384:16", "auto:0:16384:8",
    ]
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    print(f"tris={scene.num_tris}", flush=True)

    key = jax.random.PRNGKey(1234)
    idx = jnp.arange(R, dtype=jnp.uint32)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=SIZE, height=SIZE,
                      focal_length=2.0)
    o0, d0 = camera_rays(cam, idx, keys, jitter=False)
    shade_tab = make_shade_table(scene)

    built = {}

    def get_accel(C):
        if C not in built:
            bvh = build_bvh_for_scene(scene, 4,
                                      cluster_size=C if C else None)
            td = make_trace_data(scene, as_fine(bvh))
            pdata = packets.make_packet_data(
                scene,
                Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
                Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
                bvh.cl_tri,
            )
            rpack = packets.make_resident_pack(pdata, "bw")
            built[C] = (td, pdata, rpack)
        return built[C]

    # real bounce batch off the default accel
    td0, pd0, rp0 = get_accel(0)

    @jax.jit
    def bounce_batch(o0, d0):
        h = packets.trace_packets(o0, d0, pd0, fine_td=td0, tile_size=P,
                                  engine="pallas", sort=False,
                                  resident_pack=rp0)
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

    ref = None
    for cfg_s in configs:
        mode_s, c_s, w_s, f_s = cfg_s.split(":")
        C = int(c_s)
        td, pdata, rpack = get_accel(C)
        fn = jax.jit(lambda o, d, pdata=pdata, td=td, rpack=rpack,
                     mode_s=mode_s, w=int(w_s), f=int(f_s):
                     packets.trace_packets(
                         o, d, pdata, fine_td=td, mask=mask, tile_size=P,
                         max_clusters=4095, engine="pallas", sort=True,
                         sort_window=w, two_level=MODE[mode_s],
                         super_factor=f, resident_pack=rpack))
        timed(f"trace {cfg_s} (K={pdata.num_clusters} C={pdata.cluster_size})",
              fn, o1, d1)
        h = fn(o1, d1)
        tri = np.asarray(h.tri)
        if ref is None:
            ref = tri
        else:
            neq = int((tri != ref).sum())
            if neq:
                print(f"  !! tri mismatch vs first config: {neq}", flush=True)


if __name__ == "__main__":
    main()
