"""Capture a jax.profiler trace of one pt_nee render batch and print the
top device ops by total time.

The per-piece glue timings in prof_glue.py are bounded below by the axon
tunnel's ~1 ms/dispatch rate, so sub-ms pieces are unmeasurable that way;
this parses the xprof trace of the REAL fused program instead.

Usage: python tools/prof_xprof.py [subdiv] [spp]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    subdiv = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    size = int(os.environ.get("PROF_SIZE", "1024"))

    from cudapathtracer_tpu import RenderConfig, init_accum, make_camera
    from cudapathtracer_tpu.models import procedural
    from cudapathtracer_tpu.render.renderer import (
        build_bvh_for_scene, make_packet_prep, render_batch_jit,
    )

    scene = procedural.to_scene(procedural.colonnade(subdiv=subdiv))
    cfg = RenderConfig(width=size, height=size, spp=spp,
                       integrator=os.environ.get("PROF_INTEGRATOR",
                                                 "pt_nee"),
                       samples_per_call=spp, reuse_primary_hit=True)
    bvh = build_bvh_for_scene(scene, cfg.leaf_size,
                              cluster_size=cfg.cluster_size)
    cam = make_camera(pos=(0.0, 2.0, 3.4), width=size, height=size,
                      focal_length=2.0)
    key = jax.random.PRNGKey(1234)
    prep = make_packet_prep(scene, cfg, bvh)

    mode = os.environ.get("PROF_MODE", "render")
    outdir = "/tmp/xprof_r5"
    os.system(f"rm -rf {outdir}")
    if mode == "train":
        # one jitted value_and_grad step of the inverse-rendering loss
        # (the bench's train_step_ms workload, bench.py BENCH_TRAIN)
        import dataclasses

        from cudapathtracer_tpu.diff import render_grad as rg

        tcfg = dataclasses.replace(cfg, width=256, height=256, spp=1,
                                   samples_per_call=1, sample_batch=1,
                                   reuse_primary_hit=False)
        tcam = make_camera(pos=(0.0, 2.0, 3.4), width=256, height=256,
                           focal_length=2.0)
        target = rg.render_image_diff(scene, tcam, tcfg,
                                      jax.random.PRNGKey(9), 1, bvh=bvh)
        loss_fn = rg.make_loss_fn(scene, tcam, tcfg, key, 1, bvh=bvh)
        step = jax.jit(jax.value_and_grad(loss_fn))
        p0 = rg.targets_of(scene)
        loss, _ = step(p0, target)
        float(np.asarray(loss))
        with jax.profiler.trace(outdir):
            loss, grads = step(p0, target)
            float(np.asarray(loss))
        spp_div = 1
    else:
        # warm up / compile outside the trace
        st = render_batch_jit(scene, bvh, cam, cfg, key, init_accum(cfg),
                              spp, prep=prep)
        float(np.asarray(st.img.x[0]))
        with jax.profiler.trace(outdir):
            st = render_batch_jit(scene, bvh, cam, cfg, key,
                                  init_accum(cfg), spp, prep=prep)
            float(np.asarray(st.img.x[0]))

    files = glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events = data.get("traceEvents", [])
        # device lanes: pid names containing 'TPU' / 'Device'
        pid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        dev_pids = {p for p, n in pid_names.items()
                    if "TPU" in n or "Device" in n or "device" in n}
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in dev_pids:
                dur = e.get("dur", 0) / 1000.0  # us -> ms
                name = e.get("name", "?")
                agg[name] += dur
                cnt[name] += 1
                total += dur
    print(f"total device op time: {total:.1f} ms over {spp} samples "
          f"({total / spp:.1f} ms/sample)", flush=True)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, ms in top:
        print(f"{ms:9.2f} ms  x{cnt[name]:5d}  {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
