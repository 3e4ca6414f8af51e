"""Headline benchmark: rays/s on the sponza-class stress scene, real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mrays/s using the reference's own accounting
(kernel.cu:757: rays = width*height*spp*(bounces+1)), on our sponza-stand-in
``colonnade`` scene (the real sponza OBJ is not shipped with the reference —
models/ is .gitignored). Baseline: the reference's best hand-recorded sponza
run, 1170 ms for 512^2 x 100 x 4 rays (metricsForSponza.txt:8, "best
occupancy") => 89.6 Mrays/s on its contemporary GPU. vs_baseline = ours /
89.6.

Config follows BASELINE.md's target shape (sponza-scale scene at 1024^2);
spp here is a measurement window, not a quality setting — throughput is
flat across spp because every sample is the same program.

The headline is the 20k-tri scene; the JSON also carries the SCALE SWEEP
(``mrays_82k``, ``mrays_328k`` — colonnade subdiv 4/5) so the sponza-scale
number (the baseline's 262k-tri class) is apples-to-apples visible
(BASELINE.md's round tables are generated from these).

Env knobs: BENCH_SPP (default 16), BENCH_SIZE (default 1024), BENCH_SUBDIV
(colonnade sphere subdiv, default 3 => 20,884 tris; 4 => ~82k; 5 => ~328k),
BENCH_SWEEP=0 to skip the 82k/328k sweep.
"""

import json
import os
import time

BASELINE_MRAYS = 512 * 512 * 100 * 4 / (1170.0 * 1000.0)  # 89.61


def main():
    import jax

    # persistent compile cache: 1024^2 trace compiles are minutes each
    # through the remote-TPU tunnel; the cache makes re-runs (the driver's
    # end-of-round bench after a tuning session) near-instant. Must be set
    # via jax.config AFTER import — env vars alone don't reach the
    # already-initialized axon backend path.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from cudapathtracer_tpu import RenderConfig, init_accum, make_camera
    from cudapathtracer_tpu.models import procedural
    from cudapathtracer_tpu.render.renderer import (
        build_bvh_for_scene,
        make_packet_prep,
        render_batch_jit,
    )

    spp = int(os.environ.get("BENCH_SPP", "16"))
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    subdiv = int(os.environ.get("BENCH_SUBDIV", "3"))
    # sample_batch=1: joint S-sample tracing measured SLOWER on this
    # workload (the sort key doesn't convert the extra ray density into
    # tighter tiles; 4M-element argsorts scale superlinearly)
    sbatch = int(os.environ.get("BENCH_SBATCH", "1"))
    with_bdpt = os.environ.get("BENCH_BDPT", "1") != "0"
    with_sweep = os.environ.get("BENCH_SWEEP", "1") != "0"

    import numpy as np

    def measure(subdiv, spp, repeats=3):
        """-> (Mrays/s, scene, bvh, build_s) for one colonnade scale."""
        desc = procedural.colonnade(subdiv=subdiv)
        scene = procedural.to_scene(desc)
        cfg = RenderConfig(
            width=size, height=size, spp=spp,
            integrator="pt_nee", samples_per_call=spp,
            sample_batch=sbatch,
            packet_rounds=int(os.environ.get("BENCH_ROUNDS", "1")),
            packet_first_round=int(os.environ.get("BENCH_FIRST", "2")),
            sort_window=int(os.environ.get("BENCH_SORTWIN", "0")),
            cluster_size=(int(os.environ["BENCH_C"])
                          if "BENCH_C" in os.environ else None),
            tile_size=(int(os.environ["BENCH_TILE"])
                       if "BENCH_TILE" in os.environ else None),
            two_level_cull={"auto": None, "0": False, "1": True,
                            "super": "super"}[
                os.environ.get("BENCH_TWO_LEVEL", "auto")],
            super_factor=int(os.environ.get("BENCH_SUPERF", "8")),
            super_list=int(os.environ.get("BENCH_SUPERLIST", "255")),
            warm_start=(int(os.environ["BENCH_WARM"])
                        if "BENCH_WARM" in os.environ else None),
            ray_groups=(int(os.environ["BENCH_RAYGROUPS"])
                        if "BENCH_RAYGROUPS" in os.environ else None),
            reuse_primary_hit=True)  # pinhole camera, no jitter
        t0 = time.time()
        bvh = build_bvh_for_scene(scene, cfg.leaf_size,
                                  cluster_size=cfg.cluster_size)
        t_build = time.time() - t0
        cam = make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                          focal_length=2.0)
        key = jax.random.PRNGKey(1234)
        prep = make_packet_prep(scene, cfg, bvh)

        # warmup / compile — must use the SAME num_samples as the timed
        # window (num_samples is a static jit arg; a different value
        # recompiles) and a host readback to really synchronize
        # (block_until_ready is unreliable through remote-TPU tunnels).
        st = render_batch_jit(scene, bvh, cam, cfg, key, init_accum(cfg),
                              spp, prep=prep)
        float(np.asarray(st.img.x[0]))

        # timed window: spp samples; best of N (the remote-TPU tunnel's
        # host readback latency is noisy — minutes-level outliers observed)
        dt = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            st = render_batch_jit(scene, bvh, cam, cfg, key,
                                  init_accum(cfg), spp, prep=prep)
            float(np.asarray(st.img.x[0]))
            dt = min(dt, time.time() - t0)
        rays = cfg.num_pixels * spp * (cfg.num_bounces + 1)
        return rays / dt / 1e6, scene, bvh, t_build, cfg, dt

    mrays, scene, bvh, t_build, cfg, dt = measure(subdiv, spp)
    result = {
        "metric": "Mrays/s (colonnade %dk tris, %d^2, pt_nee, %d bounces)" % (
            scene.num_tris // 1000, size, cfg.num_bounces
        ),
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }

    if with_sweep:
        # sponza-scale sweep: the baseline scene is 262k tris — report the
        # 82k and 328k numbers so vs_baseline is apples-to-apples, plus
        # the 1.31M-tri point (colonnade subdiv 6, ~4x sponza: past the
        # VMEM-resident budget, exercising the DMA-pipelined kernel) to
        # prove monotone degradation with scene size (round-4 verdict
        # item 4). BENCH_BIG=0 skips the big point.
        sweep = [(4, "mrays_82k"), (5, "mrays_328k")]
        if os.environ.get("BENCH_BIG", "1") != "0":
            sweep.append((6, "mrays_1310k"))
        for sub, name in sweep:
            if sub == subdiv:
                result[name] = round(mrays, 2)
                continue
            mr, _, _, _, _, _ = measure(sub, max(4, spp // 2))
            result[name] = round(mr, 2)
        result["mrays_328k_vs_baseline"] = round(
            result["mrays_328k"] / BASELINE_MRAYS, 3)

    if with_bdpt:
        # secondary metric: BDPT — the reference's LIVE integrator
        # (kernel.cu:549) — at its live 512^2 config, same ray accounting
        import dataclasses

        bsize = 512
        # window >= 8 samples: min-of-3 over a 4-sample window was too thin
        # for the tunnel's noisy readback (r3 verdict weak #6)
        bspp = int(os.environ.get("BENCH_BDPT_SPP", str(max(8, spp // 4))))
        bsb = int(os.environ.get("BENCH_BDPT_SBATCH", "2"))
        # BDPT's batched 2R/4R traces prefer bigger tiles than pt_nee's
        # bounce traces (measured: 20.2 Mrays/s at P=256 vs 16.3 at P=128)
        btile = int(os.environ.get("BENCH_BDPT_TILE", "256"))
        btilev = os.environ.get("BENCH_BDPT_TILE_VIS")
        bcfg = dataclasses.replace(cfg, width=bsize, height=bsize,
                                   integrator="bdpt", spp=bspp,
                                   samples_per_call=bspp, sample_batch=bsb,
                                   tile_size=btile,
                                   tile_size_vis=(int(btilev) if btilev
                                                  else None))
        bcam = make_camera(pos=(0.0, 2.0, 3.4), width=bsize, height=bsize,
                           focal_length=2.0)
        key = jax.random.PRNGKey(1234)
        bprep = make_packet_prep(scene, bcfg, bvh)
        st = render_batch_jit(scene, bvh, bcam, bcfg, key,
                              init_accum(bcfg), bspp, prep=bprep)
        float(np.asarray(st.img.x[0]))
        bdt = float("inf")
        for _ in range(3):
            t0 = time.time()
            st = render_batch_jit(scene, bvh, bcam, bcfg, key,
                                  init_accum(bcfg), bspp, prep=bprep)
            float(np.asarray(st.img.x[0]))
            bdt = min(bdt, time.time() - t0)
        brays = bcfg.num_pixels * bspp * (bcfg.num_bounces + 1)
        result["bdpt_mrays"] = round(brays / bdt / 1e6, 2)
        result["bdpt_vs_baseline"] = round(
            brays / bdt / 1e6 / BASELINE_MRAYS, 3)

    if os.environ.get("BENCH_TRAIN", "1") != "0":
        # train-step metric (round-4 verdict item 3): one jitted
        # value_and_grad step of the inverse-rendering L2 loss on the
        # headline scene — the diff pass traces through the packet engine
        # (diff/render_grad.py), so this guards the gradient path's TPU
        # throughput. grad_mrays uses the forward ray accounting
        # (pixels*spp*(bounces+1)); the true work is ~2 forward traces
        # (checkpoint remat) + backward math.
        import dataclasses

        from cudapathtracer_tpu.diff import render_grad as rg

        tsize = int(os.environ.get("BENCH_TRAIN_SIZE", "256"))
        tspp = int(os.environ.get("BENCH_TRAIN_SPP", "1"))
        tcfg = dataclasses.replace(cfg, width=tsize, height=tsize,
                                   spp=tspp, samples_per_call=tspp,
                                   sample_batch=1,
                                   reuse_primary_hit=False)
        tcam = make_camera(pos=(0.0, 2.0, 3.4), width=tsize, height=tsize,
                           focal_length=2.0)
        tkey = jax.random.PRNGKey(1234)
        target = rg.render_image_diff(scene, tcam, tcfg,
                                      jax.random.PRNGKey(9), tspp, bvh=bvh)
        loss_fn = rg.make_loss_fn(scene, tcam, tcfg, tkey, tspp, bvh=bvh)
        step = jax.jit(jax.value_and_grad(loss_fn))
        p0 = rg.targets_of(scene)
        loss, _ = step(p0, target)
        float(np.asarray(loss))
        tdt = float("inf")
        for _ in range(3):
            t0 = time.time()
            loss, grads = step(p0, target)
            float(np.asarray(loss))
            tdt = min(tdt, time.time() - t0)
        result["train_step_ms"] = round(tdt * 1000.0, 1)
        result["grad_mrays"] = round(
            tsize * tsize * tspp * (tcfg.num_bounces + 1) / tdt / 1e6, 2)

    print(json.dumps(result))
    # extra context on stderr (driver only parses stdout JSON)
    import sys

    print(
        f"# tris={scene.num_tris} bvh_build={t_build:.2f}s "
        f"window={dt:.2f}s spp={spp} device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
