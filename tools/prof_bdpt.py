"""BDPT per-stage decomposition: where does the sample time go?

Times, with the renderer's real config on the colonnade headline scene:
  1. the full BDPT sample step (radiance, primary hit injected)
  2. the (2R,) subpath batch trace alone, on the real subpath rays
  3. the (4R,) shadow batch trace alone, on the real connection rays
     (bright mask + t_cap + vis_band, exactly as integrators/bdpt.py issues)
  4. shadow-lane statistics: live fraction, cap distribution

The batch inputs are CAPTURED from the integrator itself via a recording
trace_fn wrapper (an eager pass, so the arrays are concrete) — the profiled
rays cannot drift from production (ADVICE r3: the old script re-implemented
the integrator's sampling internals and silently diverged on changes).

Honest async-dispatch timing (see prof_r2c.py). Usage:
  python tools/prof_bdpt.py [subdiv] [tile_size] [vis_tile ...]

PROF_SIZE overrides the image size (default 1024; the bench BDPT config is
512^2 x sample_batch=2, so PROF_SIZE=724 ~ the bench ray count). Extra args
sweep cfg.tile_size_vis for the 4R shadow batch (same prep, fresh trace_fn).
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
from cudapathtracer_tpu.render import renderer as rd
from cudapathtracer_tpu.render.camera import camera_rays
from cudapathtracer_tpu.integrators import bdpt as bd
from cudapathtracer_tpu.ops.rng import pixel_keys, sample_key
from cudapathtracer_tpu.ops.vecmath import Vec3

SIZE = int(os.environ.get("PROF_SIZE", "1024"))
R = SIZE * SIZE


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
    print(f"{name:44s} {per:8.2f} ms", flush=True)
    return per


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print("device:", jax.devices()[0], flush=True)
    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    cfg = RenderConfig(width=SIZE, height=SIZE, integrator="bdpt",
                       tile_size=tile)
    bvh = rd.build_bvh_for_scene(scene, cfg.leaf_size,
                                 cluster_size=cfg.cluster_size)
    prep = rd.make_packet_prep(scene, cfg, bvh)
    trace_fn, _ = rd.make_trace_fn(scene, cfg, bvh, prep=prep)
    params = bd.BDPTParams(orthonormal_frame=cfg.orthonormal_frame)
    print(f"tris={scene.num_tris} tile={tile}", flush=True)

    cam = make_camera(width=SIZE, height=SIZE)
    idx = jnp.arange(R, dtype=jnp.uint32)
    key = jax.random.PRNGKey(1234)
    keys = pixel_keys(sample_key(key, jnp.int32(0)), idx)

    @jax.jit
    def primary(idx):
        o, d = camera_rays(cam, idx, keys, jitter=False, lens=False)
        return o, d, trace_fn(o, d, jnp.ones((R,), bool))

    o, d, hit0 = primary(idx)

    # ---- record the integrator's ACTUAL trace calls (eager pass) ----------
    # call 0 = the (2R,) subpath batch, call 1 = the (4R,) shadow batch
    # (the primary is injected via primary_hit). Any future call-structure
    # change shows up here as a different record count, not silent drift.
    calls = []

    def rec_trace(o_, d_, m_, **kw):
        calls.append((o_, d_, m_, kw))
        return trace_fn(o_, d_, m_, **kw)

    _ = bd.radiance_bdpt(o, d, scene, rec_trace, keys, params,
                         primary_hit=hit0)
    assert len(calls) == 2, f"expected 2 trace calls, saw {len(calls)}"
    (sub_o, sub_d, sub_m, sub_kw), (sh_o, sh_d, sh_m, sh_kw) = calls

    @jax.jit
    def subpath_batch(o_, d_, m_):
        return trace_fn(o_, d_, m_, **sub_kw)

    hb = timed("subpath (2R) batch trace", subpath_batch, sub_o, sub_d, sub_m)

    @jax.jit
    def full_sample(o, d, hit0):
        return bd.radiance_bdpt(o, d, scene, trace_fn, keys, params,
                                primary_hit=hit0)

    tot = timed("full BDPT sample (radiance)", full_sample, o, d, hit0)

    sm = np.asarray(sh_m)
    scap = np.asarray(sh_kw["t_cap"])
    print(f"shadow lanes live: {sm.sum()} / {sm.size} "
          f"({100.0 * sm.mean():.1f}%)  cap p50={np.percentile(scap[sm], 50):.2f} "
          f"p95={np.percentile(scap[sm], 95):.2f}  kw={list(sh_kw)}",
          flush=True)

    som = Vec3(jnp.asarray(sh_o.x), jnp.asarray(sh_o.y), jnp.asarray(sh_o.z))
    sdm = Vec3(jnp.asarray(sh_d.x), jnp.asarray(sh_d.y), jnp.asarray(sh_d.z))
    smj = jnp.asarray(sm)
    sckw = {k: (jnp.asarray(np.asarray(v)) if hasattr(v, "shape") else v)
            for k, v in sh_kw.items()}

    @jax.jit
    def shadow_batch(o_, d_, m_):
        return trace_fn(o_, d_, m_, **sckw)

    sh = timed("shadow (4R) batch trace (vis_dropout off)", shadow_batch,
               som, sdm, smj)

    # vis_dropout ablation: cfg.vis_dropout gates the occluded-lane dropout
    # INSIDE trace_fn (it zeroes vis_band when off), so the ON leg needs a
    # fresh trace_fn from a vis_dropout=True config — passing vis_band
    # through kwargs alone would measure the identical program twice
    # (ADVICE r4).
    import dataclasses

    on_cfg = dataclasses.replace(cfg, vis_dropout=True)
    trace_on, _ = rd.make_trace_fn(scene, on_cfg, bvh, prep=prep)

    @jax.jit
    def shadow_batch_vis(o_, d_, m_):
        return trace_on(o_, d_, m_, **sckw)

    timed("shadow (4R) trace, vis_dropout=True", shadow_batch_vis,
          som, sdm, smj)
    print(f"sum check: 2R {hb:.1f} + 4R {sh:.1f} = {hb + sh:.1f} "
          f"vs full {tot:.1f} (rest = integrator math)", flush=True)

    # ---- tile_size_vis sweep: shadow batch under each vis tile -----------
    for vt in [int(a) for a in sys.argv[3:]]:
        vcfg = dataclasses.replace(cfg, tile_size_vis=vt)
        vtrace, _ = rd.make_trace_fn(scene, vcfg, bvh, prep=prep)

        @jax.jit
        def shadow_vt(o_, d_, m_, _vt=vtrace):
            return _vt(o_, d_, m_, **sckw)

        timed(f"shadow (4R) trace, tile_size_vis={vt}", shadow_vt,
              som, sdm, smj)


if __name__ == "__main__":
    main()
