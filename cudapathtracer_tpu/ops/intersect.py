"""Vectorized ray-primitive intersection ops.

These are the reference's device intersection routines re-derived as
batched, branch-free vector ops (everything is a masked select — there is no
data-dependent control flow, so XLA maps each op onto full-width VPU lanes):

* ``ray_aabb``        — the 3-slab test (reference: BVH.h:51-83). The
  reference returns a bare bool with no positive-t or t-best clipping; we
  additionally clip against [0, t_best] which is provably result-identical
  for BVH traversal (a leaf box entirely behind the origin can only contain
  t<0 triangle hits, which the caller rejects via its ``0 < t`` filter
  anyway, kernel.cu:127) and skips more subtrees.
* ``ray_triangle``    — Moller-Trumbore with the reference's exact epsilon
  semantics (modelLoader.h:49-123): near-parallel cutoff |a| < 1e-5, reject
  on any negative barycentric, NO ``t > 0`` check (callers filter), miss
  sentinel MAX_FLOAT = 1e5.
* ``ray_sphere``      — the reference ships a dormant sphere primitive
  (sphere.h:7-13, include commented out at kernel.cu:21); the north-star
  config list keeps ray-sphere as a capability, so it is live here.

All functions broadcast: rays and primitives may each carry batch dims as
long as they broadcast together (typical shapes: rays (R,), triangles (R, L)
after a leaf gather, giving (R, L) results).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.constants import EPS_PARALLEL, MAX_FLOAT
from .vecmath import Vec3, cross, dot


def ray_aabb(o: Vec3, inv_d: Vec3, lo: Vec3, hi: Vec3, t_best=None, clip: bool = True):
    """Slab test. Returns a bool mask of box overlaps.

    ``inv_d`` is the precomputed reciprocal direction (shared across every
    node test for a ray — the division in the reference's inner loop,
    BVH.h:53-74, is hoisted out here).

    With ``clip=False`` this is bit-compatible with the reference's
    unclipped test (boxes fully behind the origin still "hit").
    """
    tx0 = (lo.x - o.x) * inv_d.x
    tx1 = (hi.x - o.x) * inv_d.x
    ty0 = (lo.y - o.y) * inv_d.y
    ty1 = (hi.y - o.y) * inv_d.y
    tz0 = (lo.z - o.z) * inv_d.z
    tz1 = (hi.z - o.z) * inv_d.z

    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    hit = tmin <= tmax
    if clip:
        hit = hit & (tmax >= 0.0)
        if t_best is not None:
            hit = hit & (tmin <= t_best)
    return hit


def ray_triangle(o: Vec3, d: Vec3, v0: Vec3, e1: Vec3, e2: Vec3):
    """Moller-Trumbore. Returns t with MAX_FLOAT as the miss sentinel.

    Matches modelLoader.h:49-123 exactly: the returned t may be negative
    (no ``t > 0`` filter here — the traversal applies ``0 < t < closest``,
    kernel.cu:127); barycentric rejections are strict ``< 0`` tests.
    ``e1 = v1 - v0``, ``e2 = v2 - v0`` are precomputed by callers (they are
    loop-invariant per triangle).
    """
    q = cross(d, e2)
    a = dot(e1, q)
    parallel = jnp.abs(a) < EPS_PARALLEL
    # The reference divides s by a (modelLoader.h:67); guard the div for
    # masked lanes so no NaN/Inf escapes into selects.
    inv_a = jnp.where(parallel, 0.0, 1.0 / jnp.where(parallel, 1.0, a))
    s = (o - v0) * inv_a
    r = cross(s, e1)
    b0 = dot(s, q)
    b1 = dot(r, d)
    b2 = 1.0 - b0 - b1
    reject = parallel | (b0 < 0.0) | (b1 < 0.0) | (b2 < 0.0)
    t = dot(e2, r)
    return jnp.where(reject, MAX_FLOAT, t)


def ray_triangle_verts(o: Vec3, d: Vec3, v0: Vec3, v1: Vec3, v2: Vec3):
    """Convenience wrapper taking raw vertices (used by the differentiable
    re-evaluation path, where edges must be functions of vertex params)."""
    return ray_triangle(o, d, v0, v1 - v0, v2 - v0)


def ray_triangle_t_unchecked(o: Vec3, d: Vec3, v0: Vec3, v1: Vec3, v2: Vec3):
    """Moller-Trumbore t WITHOUT hit tests — for a triangle already known to
    be hit (found by the discrete trace). Fully differentiable w.r.t. every
    input: this is how the detach-trick backward pass attaches d(t)/d(verts)
    and d(t)/d(ray) after the non-differentiable BVH search
    (diff/render_grad.py; cf. Dr.Jit's attached/detached intersection
    split, PAPERS.md)."""
    e1 = v1 - v0
    e2 = v2 - v0
    q = cross(d, e2)
    a = dot(e1, q)
    safe_a = jnp.where(jnp.abs(a) < 1e-12, 1e-12, a)
    s = (o - v0) * (1.0 / safe_a)
    r = cross(s, e1)
    return dot(e2, r)


def ray_sphere_t_unchecked(o: Vec3, d: Vec3, center: Vec3, radius):
    """Nearest-positive sphere t WITHOUT hit tests, for a sphere already
    known to be hit — the sphere analogue of ray_triangle_t_unchecked:
    fully differentiable w.r.t. ray, center and radius (the detach-trick
    re-evaluation used by diff/render_grad.py)."""
    oc = o - center
    a = dot(d, d)
    b = 2.0 * dot(oc, d)
    c = dot(oc, oc) - radius * radius
    disc = jnp.maximum(b * b - 4.0 * a * c, 1e-12)  # known hit: disc > 0
    sq = jnp.sqrt(disc)
    inv2a = 0.5 / jnp.maximum(a, 1e-20)
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    return jnp.where(t0 > 0.0, t0, t1)


def ray_sphere(o: Vec3, d: Vec3, center: Vec3, radius):
    """Ray-sphere intersection (sphere.h:7-13 capability).

    Returns the nearest t >= 0, MAX_FLOAT on miss. Assumes |d| = 1 is NOT
    required (handles general d).
    """
    oc = o - center
    a = dot(d, d)
    b = 2.0 * dot(oc, d)
    c = dot(oc, oc) - radius * radius
    disc = b * b - 4.0 * a * c
    miss = disc < 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    inv2a = 0.5 / a
    t0 = (-b - sq) * inv2a
    t1 = (-b + sq) * inv2a
    t = jnp.where(t0 > 0.0, t0, t1)
    return jnp.where(miss | (t <= 0.0), MAX_FLOAT, t)
