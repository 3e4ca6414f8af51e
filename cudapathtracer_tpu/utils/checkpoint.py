"""Checkpoint / resume of progressive renders.

The reference has no disk checkpoints, but its accumulation scheme is
inherently resumable: a running mean plus the sample counter is the entire
loop state (SURVEY.md §5.4; kernel.cu:552). We persist exactly that
contract: (accumulator, compensation, sample count, base seed) — RNG keys
are derived, not stored, because every draw is a pure function of
(seed, sample index, pixel index, site), so resume reproduces the
uninterrupted render bit-for-bit (tested in tests/test_checkpoint_cli.py).

Format: a single .npz (atomic rename on save) — deliberately dependency-
free and inspectable. For sharded multi-host renders each process saves its
addressable shard with a process suffix.
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
