"""Round-3 BDPT decomposition: where does a 512^2 BDPT sample go?

Pieces, honest async-dispatch timing (queue N dispatches, one readback):
  1. full sample (render_batch_jit, bdpt),
  2. glue only (both trace batches stubbed),
  3. the subpath (2R) trace alone, on production-identical rays,
  4. the connection-shadow (4R) trace alone (with t_cap), ditto.

Usage: python tools/prof_bdpt.py [subdiv] [size]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cudapathtracer_tpu import RenderConfig, init_accum, make_camera
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.integrators.bdpt import BDPTParams, radiance_bdpt
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key
from cudapathtracer_tpu.ops.traversal import Hit
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.render.renderer import (
    build_bvh_for_scene,
    make_trace_fn,
    render_batch_jit,
)

S = 4


def timed(name, fn, *args, iters=8, div=1.0):
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
    per = best / iters / div * 1000.0
    print(f"{name:52s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    R = size * size
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    cfg = RenderConfig(width=size, height=size, spp=S, integrator="bdpt",
                       samples_per_call=S, reuse_primary_hit=True)
    bvh = build_bvh_for_scene(scene, cfg.leaf_size)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                      focal_length=2.0)
    key = jax.random.PRNGKey(1234)
    print(f"tris={scene.num_tris} R={R}", flush=True)

    nul = jax.jit(lambda x: x + 1.0)
    timed("dispatch+readback floor (iters=32)", nul,
          jnp.zeros((8,), jnp.float32), iters=32)

    full = timed(
        "full bdpt render_batch (per sample)",
        lambda: render_batch_jit(scene, bvh, cam, cfg, key,
                                 init_accum(cfg), S),
        iters=4, div=S)

    # production-identical trace batches: capture the integrator's actual
    # trace calls by wrapping trace_fn with a recorder, run once eagerly
    trace_fn, _ = make_trace_fn(scene, cfg, bvh)
    idx = jnp.arange(R, dtype=jnp.uint32)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)
    o, d = jax.jit(
        lambda: camera_rays(cam, idx, keys, jitter=False, lens=False))()
    primary = trace_fn(o, d, jnp.ones((R,), bool))
    primary = Hit(t=jax.block_until_ready(primary.t), tri=primary.tri)

    calls = []

    def recorder(o, d, mask, t_cap=None):
        calls.append((o, d, mask, t_cap))
        return trace_fn(o, d, mask, t_cap=t_cap)

    params = BDPTParams(orthonormal_frame=cfg.orthonormal_frame)
    _ = radiance_bdpt(o, d, scene, recorder, keys, params,
                      primary_hit=primary)
    print(f"recorded {len(calls)} trace calls: "
          f"{[c[0].x.shape[0] for c in calls]}", flush=True)

    # stub glue: replay with constant hits
    stubs = [Hit(t=jnp.full((c[0].x.shape[0],), 2.0, jnp.float32),
                 tri=jnp.zeros((c[0].x.shape[0],), jnp.int32))
             for c in calls]

    def make_stub():
        it = {"i": 0}

        def stub(o, d, mask, t_cap=None):
            h = stubs[it["i"] % len(stubs)]
            it["i"] += 1
            return Hit(t=h.t + 0.0 * o.x, tri=h.tri)
        return stub

    @jax.jit
    def glue_only(key):
        def one(i, acc):
            kk = pixel_keys(sample_key(key, i), idx)
            rad = radiance_bdpt(o, d, scene, make_stub(), kk, params,
                                primary_hit=primary)
            return acc + rad.x
        return jax.lax.fori_loop(0, S, one, jnp.zeros((R,), jnp.float32))
    glue = timed("glue only (stub traces, per sample)",
                 lambda: glue_only(key), iters=4, div=S)

    # the two real batches in isolation
    for label, c in zip(["subpath 2R trace", "connection 4R trace (t_cap)"],
                        calls):
        o_c, d_c, m_c, cap_c = c
        o_c = jax.tree_util.tree_map(jax.block_until_ready, o_c)

        @jax.jit
        def tr(o_c=o_c, d_c=d_c, m_c=m_c, cap_c=cap_c):
            h = trace_fn(o_c, d_c, m_c, t_cap=cap_c)
            return h.t
        timed(label, tr, iters=4)

    print(f"\ntraces inside sample ~= {full - glue:.2f} ms", flush=True)
    print("ALLDONE", flush=True)


if __name__ == "__main__":
    main()
