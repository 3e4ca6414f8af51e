"""Counter-based RNG for the renderer.

The reference keeps one mutable cuRAND XORWOW state per pixel
(kernel.cu:527-533) and even has a live data race on state 0 for the lens
samples (kernel.cu:547). The TPU design removes stateful RNG entirely:
every random draw is a pure function of (base seed, sample index, draw-site
id), via JAX threefry key folding. Sequences differ from cuRAND but the
statistics match, which is the parity contract (SURVEY.md §7 "RNG sequence
semantics": match statistics, not streams).

A "site" is a static integer identifying a draw location in the integrator
(e.g. LENS_U1, BSDF_CHOICE at bounce b). Each ``uniform_site`` call yields an
independent (R,) batch of uniforms — one value per pixel — so there is no
cross-pixel state and no race by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_key(base_key, sample_index):
    """Key for one progressive sample pass."""
    return jax.random.fold_in(base_key, sample_index)


def site_key(key, site: int, bounce=None):
    k = jax.random.fold_in(key, site)
    if bounce is not None:
        k = jax.random.fold_in(k, bounce)
    return k


def uniform_site(key, site: int, shape, bounce=None, dtype=jnp.float32):
    """(0, 1] uniforms, one per element of ``shape``.

    NOTE: jax.random.uniform is [0, 1); curand_uniform is (0, 1]. The
    integrators' inequalities were written for (0, 1] (e.g. the light-pick
    scan requires randArea > 0 strictly, kernel.cu:241). We map u -> 1 - u
    to reproduce the open-at-zero interval.
    """
    u = jax.random.uniform(site_key(key, site, bounce), shape, dtype)
    return 1.0 - u


# Draw-site ids (arbitrary distinct constants, kept in one place so no two
# sites collide).
class Sites:
    LENS = 1
    BSDF_CHOICE = 2
    BSDF_U1 = 3
    BSDF_U2 = 4
    LIGHT_PICK = 5
    LIGHT_U = 6
    LIGHT_V = 7
    # BDPT-specific
    BDPT_LIGHT_PICK = 10
    BDPT_LIGHT_U = 11
    BDPT_LIGHT_V = 12
    BDPT_LIGHT_DIR_U1 = 13
    BDPT_LIGHT_DIR_U2 = 14
    BDPT_CAM_BOUNCE_U1 = 15
    BDPT_CAM_BOUNCE_U2 = 16
    # anti-aliasing jitter (extension; off by default for reference parity)
    PIXEL_JITTER_X = 20
    PIXEL_JITTER_Y = 21
