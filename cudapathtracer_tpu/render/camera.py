"""Thin-lens camera with Morton pixel ordering (reference: camera.h).

``camera_rays`` generates the whole image's primary rays in one vectorized
call — the per-thread ``cameraRay`` (camera.h:77-97) becomes a batch op over
Morton indices. Semantics replicated exactly:

* film mapping ``pxlToFilm``: x/W - 0.5 (no half-pixel centering, a
  reference quirk — there is no sub-pixel jitter either, so every sample of
  a pixel shoots the identical primary ray when radius == 0; camera.h:36-43).
  Optional jitter is available behind ``jitter=True`` (SURVEY.md §7 ledger:
  "replicate default, add jitter option").
* lens sample r = radius*sqrt(u1), theta = 2*pi*u2 (camera.h:86-88).
* direction = normalize(film_point * (-focalLength/distFromFilm) - lens_o),
  origin = cam.pos + lens_o (camera.h:90-94). Note the reference sets
  posRelFilm.z = distFromFilm *before* the scale, so the z component becomes
  -focalLength: the camera looks down -z.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.rng import Sites, uniform_site
from ..ops.vecmath import Vec3, normalized
from ..utils.constants import PI_REF
from ..utils.morton import morton_decode


class Camera(NamedTuple):
    pos: Vec3                 # scalars packed in a Vec3
    dist_from_film: jnp.ndarray
    focal_length: jnp.ndarray
    radius: jnp.ndarray       # aperture; 0 = pinhole (live config kernel.cu:646)
    width: int                # static
    height: int               # static


def make_camera(pos=(0.0, 1.0, 3.0), dist_from_film=1.0, focal_length=3.0,
                radius=0.0, width=512, height=512) -> Camera:
    """Defaults = the reference's hard-coded camera (kernel.cu:643-648)."""
    return Camera(
        pos=Vec3(*(jnp.float32(p) for p in pos)),
        dist_from_film=jnp.float32(dist_from_film),
        focal_length=jnp.float32(focal_length),
        radius=jnp.float32(radius),
        width=width,
        height=height,
    )


def camera_rays(cam: Camera, idx, keys, jitter: bool = False,
                lens: bool = True):
    """Primary rays for Morton indices ``idx`` (shape (R,)).

    ``keys`` are the per-pixel keys for this sample (ops/rng.pixel_keys);
    lens uniforms use the LENS sites — one *independent* pair per pixel,
    which also fixes the reference's randState[0] race (kernel.cu:547)
    where all pixels shared one lens sample stream.

    ``lens=False`` (static) is a pinhole fast path: valid ONLY when
    cam.radius == 0 (the caller asserts). It skips the two lens threefry
    draws (~2 ms/sample at 1M pixels) and — with jitter off — removes the
    rays' dependence on ``keys`` entirely, letting XLA hoist ray generation
    out of the sample loop.
    """
    x, y = morton_decode(idx)
    fx = x.astype(jnp.float32) / cam.width - 0.5
    fy = y.astype(jnp.float32) / cam.height - 0.5
    if jitter:
        jx = uniform_site(keys, Sites.PIXEL_JITTER_X)
        jy = uniform_site(keys, Sites.PIXEL_JITTER_Y)
        fx = fx + jx / cam.width
        fy = fy + jy / cam.height

    if lens:
        u1 = uniform_site(keys, Sites.LENS_U1)
        u2 = uniform_site(keys, Sites.LENS_U2)
        r = cam.radius * jnp.sqrt(u1)
        theta = 2.0 * PI_REF * u2
        lens_o = Vec3(r * jnp.cos(theta), r * jnp.sin(theta),
                      jnp.zeros_like(r))
    else:
        z = jnp.zeros_like(fx)
        lens_o = Vec3(z, z, z)

    scale = -cam.focal_length / cam.dist_from_film
    film = Vec3(fx * scale, fy * scale, cam.dist_from_film * scale)

    o = lens_o + cam.pos
    d = normalized(film - lens_o)
    return o, d
