"""Isolate the resident kernel's cost components.

Synthetic shortlists over the colonnade cluster set: counts=c for ALL
tiles, entries=0 (early exit never fires) -> cost(c) = fixed + c * slot.
Run: python tools/prof_kernel.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.ops import packets
from cudapathtracer_tpu.ops.pallas.dense_resident import (
    dense_intersect_resident,
    pack_cluster_boxes,
    pack_clusters_resident,
)
from cudapathtracer_tpu.ops.vecmath import Vec3
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene

R = 1 << 20
P = 256
Tl = R // P


def timed(name, fn, *args, iters=8):
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
    per = best / iters * 1000.0
    print(f"{name:46s} {per:8.2f} ms", flush=True)
    return per


def main():
    scene = procedural.to_scene(procedural.colonnade(subdiv=3))
    bvh = build_bvh_for_scene(scene, 4)
    pdata = packets.make_packet_data(
        scene,
        Vec3(bvh.cl_lo_x, bvh.cl_lo_y, bvh.cl_lo_z),
        Vec3(bvh.cl_hi_x, bvh.cl_hi_y, bvh.cl_hi_z),
        bvh.cl_tri,
    )
    K, C = pdata.num_clusters, pdata.cluster_size
    print(f"K={K} C={C} Tl={Tl} P={P}", flush=True)
    cl_packed = jax.block_until_ready(pack_clusters_resident(pdata))
    boxes = jax.block_until_ready(pack_cluster_boxes(pdata))

    key = jax.random.PRNGKey(0)
    rays = jax.random.normal(key, (Tl, 8, P), jnp.float32)
    rays = rays.at[:, 6, :].set(1.0)  # lane mask on
    rays = rays.at[:, 7, :].set(1e5)  # row 7 = search cap (no cap here)
    M = 32

    for c in (0, 1, 2, 4, 8, 16, 32):
        ids = jnp.tile(
            jnp.arange(M, dtype=jnp.int32)[None, :] % K, (Tl, 1))
        counts = jnp.full((Tl,), c, jnp.int32)
        entries = jnp.zeros((Tl, M), jnp.float32)  # never early-exits
        timed(f"counts={c:3d} (no early exit)",
              lambda i_, c_, e_, r_: dense_intersect_resident(
                  i_, c_, e_, r_, cl_packed, boxes, pdata.num_tris),
              ids, counts, entries, rays, iters=4)


if __name__ == "__main__":
    main()
