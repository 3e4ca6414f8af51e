"""Checkpoint / resume of progressive renders.

The reference has no disk checkpoints, but its accumulation scheme is
inherently resumable: a running mean plus the sample counter is the entire
loop state (SURVEY.md §5.4; kernel.cu:552). We persist exactly that
contract: (accumulator, compensation, sample count, base seed) — RNG keys
are derived, not stored, because every draw is a pure function of
(seed, sample index, pixel index, site), so resume reproduces the
uninterrupted render bit-for-bit (tested in tests/test_checkpoint_cli.py).

Format: a single .npz (atomic rename on save) — deliberately dependency-
free and inspectable.

Multi-host sharded renders (parallel/shard.render_sharded) use
``save_checkpoint_sharded`` / ``load_checkpoint_sharded``: each process
saves only its ADDRESSABLE shards to ``<path>.p<pid>of<nproc>.npz``
(atomic, no cross-host traffic), tagged with their global offsets. Resume
requires the same process count and tile mesh; a global (n, seed)
consistency check across processes runs at load (the resume contract is
the reference's accumulation state, kernel.cu:552 — a stale or mixed
checkpoint set must fail loudly, not average two different renders).
Tested end-to-end in tests/test_distributed.py (2 processes x 4 devices:
save at spp=2, resume to spp=4, bit-compare vs an uninterrupted run).
"""

from __future__ import annotations

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ..ops.vecmath import Vec3
from ..render.renderer import AccumState

_FORMAT_VERSION = 1


def save_checkpoint(path, state: AccumState, seed: int, cfg=None):
    """Atomic save. ``cfg`` (RenderConfig) is stored for shape validation."""
    payload = dict(
        version=_FORMAT_VERSION,
        img_x=np.asarray(state.img.x),
        img_y=np.asarray(state.img.y),
        img_z=np.asarray(state.img.z),
        comp_x=np.asarray(state.comp.x),
        comp_y=np.asarray(state.comp.y),
        comp_z=np.asarray(state.comp.z),
        n=np.asarray(state.n),
        seed=np.asarray(seed, np.int64),
    )
    if cfg is not None:
        payload["width"] = np.asarray(cfg.width)
        payload["height"] = np.asarray(cfg.height)
        payload["integrator"] = np.asarray(cfg.integrator)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path, cfg=None):
    """-> (AccumState, seed). Validates shapes against cfg when given."""
    with np.load(path, allow_pickle=False) as z:
        assert int(z["version"]) == _FORMAT_VERSION, int(z["version"])
        if cfg is not None:
            assert int(z["width"]) == cfg.width, "checkpoint width mismatch"
            assert int(z["height"]) == cfg.height
            assert str(z["integrator"]) == cfg.integrator, (
                "checkpoint was rendered with a different integrator"
            )
        state = AccumState(
            img=Vec3(jnp.asarray(z["img_x"]), jnp.asarray(z["img_y"]),
                     jnp.asarray(z["img_z"])),
            comp=Vec3(jnp.asarray(z["comp_x"]), jnp.asarray(z["comp_y"]),
                      jnp.asarray(z["comp_z"])),
            n=jnp.asarray(z["n"]),
        )
        return state, int(z["seed"])


# ---------------------------------------------------------------------------
# multi-host sharded checkpointing
# ---------------------------------------------------------------------------

def _state_leaves(state: AccumState):
    return dict(
        img_x=state.img.x, img_y=state.img.y, img_z=state.img.z,
        comp_x=state.comp.x, comp_y=state.comp.y, comp_z=state.comp.z,
    )


def shard_path(path, process_index: int, process_count: int) -> str:
    return f"{path}.p{process_index}of{process_count}.npz"


def save_checkpoint_sharded(path, state: AccumState, seed: int, cfg=None):
    """Each process atomically saves its addressable shards of ``state``.

    ``state`` leaves must be jax.Arrays sharded over the tile mesh
    (parallel/shard.py); the scalar ``n`` is replicated. No host gathers a
    remote shard — save cost is local-disk only, so a pod render can
    checkpoint at samples_per_call granularity."""
    import jax

    pid = jax.process_index()
    nproc = jax.process_count()
    payload = dict(
        version=_FORMAT_VERSION,
        sharded=np.asarray(1),
        process_index=np.asarray(pid),
        process_count=np.asarray(nproc),
        n=np.asarray(state.n),
        seed=np.asarray(seed, np.int64),
        num_pixels=np.asarray(state.img.x.shape[0]),
    )
    if cfg is not None:
        payload["width"] = np.asarray(cfg.width)
        payload["height"] = np.asarray(cfg.height)
        payload["integrator"] = np.asarray(cfg.integrator)
    for name, leaf in _state_leaves(state).items():
        shards = sorted(leaf.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        payload[f"{name}_nshards"] = np.asarray(len(shards))
        for i, s in enumerate(shards):
            payload[f"{name}_s{i}"] = np.asarray(s.data).reshape(-1)
            payload[f"{name}_o{i}"] = np.asarray(s.index[0].start or 0)
    target = shard_path(path, pid, nproc)
    d = os.path.dirname(os.path.abspath(target)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, target)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint_sharded(path, mesh, cfg=None):
    """-> (AccumState as global jax.Arrays on ``mesh``, seed).

    Each process reads ONLY its own ``<path>.p<pid>of<nproc>.npz`` and
    re-materializes its addressable shards; the global array is assembled
    with jax.make_array_from_single_device_arrays. Fails loudly if the
    process count changed or if (n, seed) disagree across processes."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    from ..parallel.mesh import TILE_AXIS

    pid = jax.process_index()
    nproc = jax.process_count()
    target = shard_path(path, pid, nproc)
    if not os.path.exists(target):
        raise FileNotFoundError(
            f"{target} not found — sharded checkpoints are per-process; "
            f"resume must run with the process count that saved them"
        )
    with np.load(target, allow_pickle=False) as z:
        assert int(z["version"]) == _FORMAT_VERSION, int(z["version"])
        assert int(z["process_count"]) == nproc, (
            f"checkpoint saved with {int(z['process_count'])} processes, "
            f"resuming with {nproc}"
        )
        assert int(z["process_index"]) == pid
        if cfg is not None:
            assert int(z["width"]) == cfg.width, "checkpoint width mismatch"
            assert int(z["height"]) == cfg.height
            assert str(z["integrator"]) == cfg.integrator
        n = int(z["n"])
        seed = int(z["seed"])
        num_pixels = int(z["num_pixels"])

        sharding = NamedSharding(mesh, PartitionSpec(TILE_AXIS))
        rep = NamedSharding(mesh, PartitionSpec())
        # device order within this process must match what device_put used:
        # the sharding's own addressable order keyed by global offset
        dev_map = sharding.addressable_devices_indices_map((num_pixels,))

        def leaf(name):
            nshards = int(z[f"{name}_nshards"])
            by_off = {int(z[f"{name}_o{i}"]): np.asarray(z[f"{name}_s{i}"])
                      for i in range(nshards)}
            singles = []
            for dev, idx in dev_map.items():
                off = idx[0].start or 0
                assert off in by_off, (
                    f"shard at offset {off} missing from {target} — was the "
                    f"mesh layout (devices per process) changed?"
                )
                singles.append(jax.device_put(by_off[off], dev))
            return jax.make_array_from_single_device_arrays(
                (num_pixels,), sharding, singles
            )

        state = AccumState(
            img=Vec3(leaf("img_x"), leaf("img_y"), leaf("img_z")),
            comp=Vec3(leaf("comp_x"), leaf("comp_y"), leaf("comp_z")),
            n=jax.device_put(jnp.asarray(n, jnp.int32), rep),
        )

    # global consistency: every process must hold the same (n, seed) — a
    # mixed set (one host resumed from an older save) would silently
    # average two different renders otherwise
    if nproc > 1:
        from jax.experimental import multihost_utils

        all_ns = multihost_utils.process_allgather(
            np.asarray([n, seed], np.int64))
        assert (all_ns == all_ns[0]).all(), (
            f"inconsistent checkpoint set across processes: (n, seed) = "
            f"{all_ns.tolist()}"
        )
    return state, seed
