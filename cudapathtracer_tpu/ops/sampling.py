"""Direction and light sampling, replicating the reference's estimators.

Everything here is batched over rays: inputs/outputs are SoA Vec3 with (R,)
components. The reference's quirks are preserved deliberately — they shape
the images we must match (SURVEY.md §7 quirks ledger):

* ``tangent_frame`` does NOT normalize the tangent/bitangent
  (kernel.cu:44-54). Since |cross(n, axis)| = sin(angle) <= 1, the
  tangential components of sampled directions are shrunk before the final
  normalize, squashing the distribution toward the normal. This biases both
  hemisphere samplers relative to their nominal pdfs, and the reference's
  goldens bake that in. ``orthonormal=True`` gives the fixed, unbiased frame.
* ``uniform_hemisphere`` (kernel.cu:60-77): u1 is the *cosine* directly
  (y = u1, r = sqrt(1 - u1^2)) — that's uniform in cos, not uniform in solid
  angle; nominal pdf used by the integrator is 1/(2 pi).
* ``cosine_hemisphere`` (kernel.cu:78-99): standard concentric-free mapping
  r = sqrt(u1), y = sqrt(1 - u1); nominal pdf cos(theta)/pi.
* ``sample_triangle_point`` (kernel.cu:254-258): fold u+v > 1 by mirroring
  about (0.5, 0.5).
* ``pick_light`` (kernel.cu:231-244, 468-481): linear scan over emissive
  triangles, selecting the one whose area interval straddles
  u * totalLightArea, with the reference's exact strict inequalities and the
  quirk that when nothing matches (u == 0, or float drift at the end) the
  fallback is *scene triangle 0*, not the first light.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import PI_REF
from .vecmath import Vec3, cross, dot, normalized, where


def tangent_frame(n: Vec3, orthonormal: bool = False):
    """Reference getTangent (kernel.cu:44-54) + bitangent (kernel.cu:70).

    Returns (tangent, bitangent) — UNNORMALIZED by default, matching the
    reference bias described in the module docstring.
    """
    c1 = cross(n, Vec3.full(n.shape, 0.0, 0.0, 1.0))
    c2 = cross(n, Vec3.full(n.shape, 0.0, 1.0, 0.0))
    t = where(dot(c1, c1) > dot(c2, c2), c1, c2)
    if orthonormal:
        t = normalized(t)
    b = cross(n, t)
    return t, b


def _frame_dir(n: Vec3, local: Vec3, orthonormal: bool) -> Vec3:
    """norm*y + tangent*x + bitangent*z, then normalize (kernel.cu:71-74)."""
    t, b = tangent_frame(n, orthonormal)
    d = n * local.y + t * local.x + b * local.z
    return normalized(d)


def uniform_hemisphere(n: Vec3, u1, u2, orthonormal: bool = False) -> Vec3:
    """randRay (kernel.cu:60-77). Nominal pdf 1/(2*pi)."""
    r = jnp.sqrt(1.0 - u1 * u1)
    phi = 2.0 * PI_REF * u2
    local = Vec3(r * jnp.cos(phi), u1, r * jnp.sin(phi))
    return _frame_dir(n, local, orthonormal)


def cosine_hemisphere(n: Vec3, u1, u2, orthonormal: bool = False) -> Vec3:
    """cosineWeightedRay (kernel.cu:78-99). Nominal pdf cos(theta)/pi."""
    r = jnp.sqrt(u1)
    theta = 2.0 * PI_REF * u2
    local = Vec3(
        r * jnp.cos(theta),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - u1)),
        r * jnp.sin(theta),
    )
    return _frame_dir(n, local, orthonormal)


def sample_triangle_point(v0: Vec3, a1: Vec3, a2: Vec3, u, v):
    """Uniform point on a triangle with the reference's fold
    (kernel.cu:254-261): if u+v > 1, mirror both about 0.5. Returns the
    point v0 + a1*u' + a2*v' (callers add any normal offset themselves)."""
    over = (u + v) > 1.0
    u = jnp.where(over, 1.0 - u, u)
    v = jnp.where(over, 1.0 - v, v)
    return v0 + a1 * u + a2 * v


def triangle_areas(scene, light_idx):
    """Areas of the given triangles, computed from current vertex positions
    (differentiable — the loop at kernel.cu:233-244 recomputes areas per
    sample the same way). light_idx: (L,) scene-triangle indices."""
    from .vecmath import gather, length

    tv0 = jnp.take(scene.tri_v0, light_idx, mode="clip")
    tv1 = jnp.take(scene.tri_v1, light_idx, mode="clip")
    tv2 = jnp.take(scene.tri_v2, light_idx, mode="clip")
    v0 = gather(scene.verts, tv0)
    v1 = gather(scene.verts, tv1)
    v2 = gather(scene.verts, tv2)
    return length(cross(v1 - v0, v2 - v0)) * 0.5


def pick_light(rand_area, areas, light_idx):
    """Replicate the reference light-pick scan exactly (kernel.cu:231-244).

    rand_area: (R,) = u * totalLightArea. areas: (L,). light_idx: (L,) scene
    tri indices. Returns (R,) selected scene-triangle indices.

    The scan semantics: walking lights in order, with remaining = rand_area
    minus the cumulative area so far, select light j iff
    ``0 < remaining_j < area_j`` — last writer wins, but intervals are
    disjoint so at most one matches; fallback is scene tri 0.
    """
    if light_idx.shape[0] == 0:
        # No emissive triangles: the reference scan never matches and falls
        # through to scene triangle 0 (kernel.cu:232) — same here.
        return jnp.zeros(rand_area.shape, jnp.int32)
    cum = jnp.cumsum(areas)
    prev_cum = cum - areas  # cumulative area before light j
    # remaining_j = rand_area - prev_cum[j]; match iff 0 < remaining < area_j
    rem = rand_area[:, None] - prev_cum[None, :]  # (R, L)
    match = (rem > 0.0) & (rem < areas[None, :])
    any_match = jnp.any(match, axis=1)
    j = jnp.argmax(match, axis=1)
    sel = jnp.take(light_idx, j, mode="clip")
    return jnp.where(any_match, sel, 0).astype(jnp.int32)
