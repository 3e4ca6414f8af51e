"""Worker for the two-process jax.distributed test (test_distributed.py).

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent);
after ``initialize_distributed`` the global mesh spans 8 devices across
the 2 processes. The worker renders the cornell scene sharded over the
global mesh, then each process checks its OWN addressable shards against
a locally-computed single-device reference (the cross-process contract:
RNG keys on pixel index, so every tile's pixels match the full render).

Usage: python distributed_worker.py <coordinator> <num_procs> <process_id>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from cudapathtracer_tpu.parallel.mesh import (
        TILE_AXIS,
        initialize_distributed,
        make_tile_mesh,
    )

    initialize_distributed(coordinator=coord, num_processes=nproc,
                           process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cudapathtracer_tpu import RenderConfig, init_accum, make_camera, render
    from cudapathtracer_tpu.models import procedural
    from cudapathtracer_tpu.parallel.shard import render_sharded
    from cudapathtracer_tpu.render.renderer import build_bvh_for_scene

    scene = procedural.to_scene(procedural.cornell_box())
    cam = make_camera(width=16, height=16)
    bvh = build_bvh_for_scene(scene, 4)
    cfg = RenderConfig(width=16, height=16, spp=2, integrator="pt_nee",
                       samples_per_call=2)

    mesh = make_tile_mesh()
    rep = NamedSharding(mesh, P())
    til = NamedSharding(mesh, P(TILE_AXIS))

    def put(tree, sharding_for):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding_for(x)), tree
        )

    # every process holds the identical full values; device_put slices the
    # addressable shards locally and assembles a global jax.Array
    scene_g = put(scene, lambda x: rep)
    bvh_g = put(bvh, lambda x: rep)
    cam_g = put(cam, lambda x: rep)
    state_g = put(init_accum(cfg),
                  lambda x: til if jnp.ndim(x) >= 1 else rep)
    idx_g = jax.device_put(
        jnp.arange(cfg.num_pixels, dtype=jnp.uint32), til)
    key_g = jax.device_put(jax.random.PRNGKey(4), rep)

    st = render_sharded(scene_g, bvh_g, cam_g, cfg, key_g, state_g, 2,
                        mesh, idx=idx_g)

    # local single-device reference (full image; identical on both procs)
    ref = render(scene, cam, cfg, seed=4)
    ref_x = np.asarray(ref.img.x)

    checked = 0
    for s in st.img.x.addressable_shards:
        got = np.asarray(s.data).reshape(-1)
        want = ref_x[s.index[0]]
        np.testing.assert_allclose(got, want, rtol=3e-6, atol=1e-7)
        checked += got.size
    assert checked == cfg.num_pixels // nproc, checked
    print(f"OK process {pid}: {checked} pixels verified", flush=True)

    # ---- multi-host sharded checkpoint: save, reload, resume -------------
    # Contract (kernel.cu:552 accumulation state): resuming a sharded
    # render from per-process shard files must be BIT-identical to the
    # uninterrupted sharded run.
    import tempfile

    from cudapathtracer_tpu.utils.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    ckdir = tempfile.mkdtemp(prefix=f"ckpt_shared_")
    # both processes must use the SAME directory: derive from coordinator
    # port (the parent passes a shared tmpdir via argv[4])
    ckdir = sys.argv[4] if len(sys.argv) > 4 else ckdir
    ckpath = f"{ckdir}/render.ckpt"
    save_checkpoint_sharded(ckpath, st, seed=4, cfg=cfg)

    st2, seed2 = load_checkpoint_sharded(ckpath, mesh, cfg=cfg)
    assert seed2 == 4 and int(st2.n) == 2

    # resume 2 more samples from the loaded state; compare against an
    # uninterrupted 4-sample run (same sharded pipeline, same key)
    st_resumed = render_sharded(scene_g, bvh_g, cam_g, cfg, key_g, st2, 2,
                                mesh, idx=idx_g)
    st_straight = render_sharded(scene_g, bvh_g, cam_g, cfg, key_g,
                                 put(init_accum(cfg),
                                     lambda x: til if jnp.ndim(x) >= 1
                                     else rep), 4, mesh, idx=idx_g)
    for a, b in zip(st_resumed.img.x.addressable_shards,
                    st_straight.img.x.addressable_shards):
        np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))
    assert int(st_resumed.n) == 4
    print(f"OK process {pid}: sharded checkpoint resume bit-exact",
          flush=True)

    # ---- cross-process train-step gradient psum (the DCN path) -----------
    # The single-process mesh tests (test_parallel.py) verify the sharded
    # gradient math; here the SAME psum runs across two real processes over
    # the jax.distributed transport, and every process checks the
    # all-reduced gradients against a locally-computed single-device
    # reference (round-3 verdict: this path was untested).
    from cudapathtracer_tpu.diff import render_grad as rg
    from cudapathtracer_tpu.parallel.shard import make_sharded_grad_fn

    gkey = jax.random.PRNGKey(7)
    target = rg.render_image_diff(scene, cam, cfg, jax.random.PRNGKey(9), 1,
                                  bvh=bvh)  # local full image, same on both

    def loss_single(p):
        s = rg.scene_with(scene, p)
        img = rg.render_image_diff(s, cam, cfg, gkey, 1, bvh=bvh)
        dx = img.x - target.x
        dy = img.y - target.y
        dz = img.z - target.z
        return jnp.sum(dx * dx + dy * dy + dz * dz) / cfg.num_pixels

    p0 = rg.targets_of(scene)
    loss_ref, grads_ref = jax.value_and_grad(loss_single)(p0)

    grad_fn = make_sharded_grad_fn(scene_g, cam_g, cfg, mesh, spp=1,
                                   bvh=bvh_g)
    p0_g = put(p0, lambda x: rep)
    target_g = put(target, lambda x: til)
    loss_sh, grads_sh = jax.jit(grad_fn)(
        p0_g, target_g, idx_g, jax.device_put(gkey, rep))

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=2e-5)
    for name in ("albedo", "emission"):
        g_sh = getattr(grads_sh, name)
        g_rf = getattr(grads_ref, name)
        for ax in ("x", "y", "z"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_sh, ax)),
                np.asarray(getattr(g_rf, ax)),
                rtol=2e-5, atol=1e-7,
                err_msg=f"grad {name}.{ax} (process {pid})")
    for ax in ("x", "y", "z"):
        np.testing.assert_allclose(
            np.asarray(getattr(grads_sh.verts, ax)),
            np.asarray(getattr(grads_ref.verts, ax)),
            rtol=2e-5, atol=1e-6, err_msg=f"grad verts.{ax}")
    print(f"OK process {pid}: cross-process grad psum parity", flush=True)


if __name__ == "__main__":
    main()
