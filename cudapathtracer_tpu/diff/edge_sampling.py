"""Visibility (silhouette) gradients via primary-edge sampling.

The interior gradient (diff/render_grad.py, the detach trick) treats the
hit-id field as fixed: it cannot see that moving a vertex sweeps silhouette
edges across pixels. This module adds that boundary term for PRIMARY
visibility — the dominant term for image-space losses — following the edge
sampling construction of differentiable rasterization/path tracing (Li et
al. 2018 "Differentiable Monte Carlo Ray Tracing through Edge Sampling",
PAPERS.md): for the pixel-footprint-averaged image

    I_j = (1/A) \\int_pixel L(x) dA,

a silhouette curve Gamma moving with scene parameters theta contributes

    dI_j/dtheta = (1/A) \\oint_{Gamma ∩ pixel} (L- − L+) d(n.x_G)/dtheta ds,

where n is the image-space unit normal of the edge, L-/L+ the radiance on
the −n/+n sides, and x_G(theta) the projected edge point. We estimate it by
sampling points on mesh edges, keeping only camera silhouettes, evaluating
the two one-sided radiances (detached), and emitting a value-zero /
gradient-carrying contribution

    (L- − L+)_det * [n.x_img(p(theta)) − stop_grad(n.x_img(p(theta)))] * w

scattered into the pixel the point projects to. Adding this image to the
interior estimate leaves the primal value untouched and augments only the
cotangents — so it composes with any loss.

Scope/assumptions (documented limitations, all standard for a first
boundary pass): pinhole camera (aperture 0 — defocus blurs the boundary
anyway), box pixel filter (matches the renderer's jittered pixel integral),
primary visibility only (shadow/indirect silhouettes are future work),
triangle geometry (sphere silhouettes are smooth in theta except at the
horizon — their interior gradient already captures first-order motion).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.vecmath import Vec3, gather, normalized
from ..utils.morton import morton_encode


class EdgeTable(NamedTuple):
    """Unique undirected mesh edges with their adjacent faces (a pytree).

    ev0/ev1: (E,) i32 vertex ids; fa: (E,) i32 owning face; fb: (E,) i32
    second face or -1 (open/boundary edge — always a silhouette)."""

    ev0: jnp.ndarray
    ev1: jnp.ndarray
    fa: jnp.ndarray
    fb: jnp.ndarray

    @property
    def num_edges(self):
        return self.ev0.shape[0]


def build_edge_table(tris) -> EdgeTable:
    """Host-side edge extraction. tris: (T, 3) int numpy."""
    tris = np.asarray(tris, np.int64)
    T = tris.shape[0]
    ea = tris[:, [0, 1, 2]].reshape(-1)
    eb = tris[:, [1, 2, 0]].reshape(-1)
    lo = np.minimum(ea, eb)
    hi = np.maximum(ea, eb)
    face = np.repeat(np.arange(T, dtype=np.int64), 3)
    key = lo * (tris.max() + 1) + hi
    order = np.argsort(key, kind="stable")
    key_s, lo_s, hi_s, face_s = key[order], lo[order], hi[order], face[order]
    first = np.ones(key_s.shape[0], bool)
    first[1:] = key_s[1:] != key_s[:-1]
    idx_first = np.flatnonzero(first)
    ev0 = lo_s[idx_first]
    ev1 = hi_s[idx_first]
    fa = face_s[idx_first]
    # second face: the following entry when it shares the key
    nxt = idx_first + 1
    has_b = np.zeros(idx_first.shape[0], bool)
    in_range = nxt < key_s.shape[0]
    has_b[in_range] = key_s[nxt[in_range]] == key_s[idx_first[in_range]]
    fb = np.full(idx_first.shape[0], -1, np.int64)
    fb[has_b] = face_s[nxt[has_b]]
    return EdgeTable(
        ev0=jnp.asarray(ev0, jnp.int32),
        ev1=jnp.asarray(ev1, jnp.int32),
        fa=jnp.asarray(fa, jnp.int32),
        fb=jnp.asarray(fb, jnp.int32),
    )


def _project_film(cam, p: Vec3):
    """World point -> film coords (fx, fy) in [-0.5, 0.5]^2 (pinhole).

    Inverse of camera_rays' film mapping: a ray direction dirc = p - pos is
    proportional to (fx*s, fy*s, D*s) with s = -f/D, so
    fx = D * dirc.x / dirc.z (valid for dirc.z < 0, in front of the
    camera looking down -z)."""
    dx = p.x - cam.pos.x
    dy = p.y - cam.pos.y
    dz = p.z - cam.pos.z
    safe_z = jnp.where(jnp.abs(dz) < 1e-12, -1e-12, dz)
    fx = cam.dist_from_film * dx / safe_z
    fy = cam.dist_from_film * dy / safe_z
    return fx, fy, dz < 0.0


def _rays_from_film(cam, fx, fy):
    """Pinhole primary rays through film coords (camera.h:90-94 mapping)."""
    scale = -cam.focal_length / cam.dist_from_film
    film = Vec3(
        fx * scale, fy * scale,
        jnp.broadcast_to(cam.dist_from_film * scale, fx.shape),
    )
    n = fx.shape[0]
    o = Vec3(
        jnp.broadcast_to(cam.pos.x, (n,)),
        jnp.broadcast_to(cam.pos.y, (n,)),
        jnp.broadcast_to(cam.pos.z, (n,)),
    )
    return o, normalized(film)


def boundary_image(scene, cam, edges: EdgeTable, radiance_fn, key,
                   num_samples: int, num_pixels: int,
                   offset_film: float = 2e-4) -> Vec3:
    """The boundary-gradient image: (R,) Vec3 whose VALUE is exactly zero
    and whose vertex cotangents carry the silhouette term.

    radiance_fn(o, d, keys_idx) -> Vec3: one-sample radiance estimate for
    rays (o, d); must already be the DETACHED estimator (its own gradient
    is irrelevant here — stop_gradient is applied to its output anyway).
    """
    E = edges.num_edges
    M = int(num_samples)
    ke, ku = jax.random.split(key)
    eidx = jax.random.randint(ke, (M,), 0, E)
    u = jax.random.uniform(ku, (M,))

    va = gather(scene.verts, jnp.take(edges.ev0, eidx, mode="clip"))
    vb = gather(scene.verts, jnp.take(edges.ev1, eidx, mode="clip"))
    p = va + (vb - va) * u  # differentiable in verts

    # ---- silhouette test (detached) ---------------------------------------
    fa = jnp.take(edges.fa, eidx, mode="clip")
    fb = jnp.take(edges.fb, eidx, mode="clip")
    na = gather(scene.tri_norm, fa)
    nb = gather(scene.tri_norm, jnp.maximum(fb, 0))
    view = Vec3(p.x - cam.pos.x, p.y - cam.pos.y, p.z - cam.pos.z)
    sa = na.x * view.x + na.y * view.y + na.z * view.z
    sb = nb.x * view.x + nb.y * view.y + nb.z * view.z
    silhouette = (fb < 0) | (sa * sb < 0.0)
    silhouette = jax.lax.stop_gradient(silhouette)

    # ---- projection (fx, fy attached; everything else detached) -----------
    fx, fy, in_front = _project_film(cam, p)
    fxa, fya, fra = _project_film(cam, va)
    fxb, fyb, frb = _project_film(cam, vb)
    # image-space tangent at p: d(x_img)/du, exact perspective jacobian
    D = cam.dist_from_film
    ex = vb.x - va.x
    ey = vb.y - va.y
    ez = vb.z - va.z
    dzs = jax.lax.stop_gradient(jnp.where(jnp.abs(view.z) < 1e-12, -1e-12,
                                          view.z))
    txu = D * (ex * dzs - jax.lax.stop_gradient(view.x) * ez) / (dzs * dzs)
    tyu = D * (ey * dzs - jax.lax.stop_gradient(view.y) * ez) / (dzs * dzs)
    txu = jax.lax.stop_gradient(txu)
    tyu = jax.lax.stop_gradient(tyu)
    speed = jnp.sqrt(txu * txu + tyu * tyu)
    inv_speed = jnp.where(speed > 1e-12, 1.0 / jnp.maximum(speed, 1e-12),
                          0.0)
    nhx = -tyu * inv_speed  # unit image normal (detached)
    nhy = txu * inv_speed

    W, H = cam.width, cam.height
    fxd = jax.lax.stop_gradient(fx)
    fyd = jax.lax.stop_gradient(fy)
    pxf = (fxd + 0.5) * W
    pyf = (fyd + 0.5) * H
    px = jnp.floor(pxf).astype(jnp.int32)
    py = jnp.floor(pyf).astype(jnp.int32)
    inside = ((px >= 0) & (px < W) & (py >= 0) & (py < H)
              & in_front & fra & frb)
    valid = silhouette & inside & (speed > 1e-12)

    # ---- one-sided radiance (detached) ------------------------------------
    eps = offset_film
    o_m, d_m = _rays_from_film(cam, fxd - eps * nhx, fyd - eps * nhy)
    o_p, d_p = _rays_from_film(cam, fxd + eps * nhx, fyd + eps * nhy)
    kidx = jnp.arange(M, dtype=jnp.uint32)
    l_m = radiance_fn(o_m, d_m, kidx)
    l_p = radiance_fn(o_p, d_p, kidx + jnp.uint32(M))
    dl = jax.lax.stop_gradient(l_m - l_p)  # (L-) - (L+)

    # ---- assemble the value-zero, gradient-carrying contribution ----------
    # n . x_img(p(theta)): ONLY this factor keeps its tangent
    xn = nhx * fx + nhy * fy
    xn_motion = xn - jax.lax.stop_gradient(xn)
    # pdf: uniform over edges x u  => weight = E * |dx/du| ; pixel-mean
    # normalization divides by the pixel's film area (1/W)*(1/H)
    w = jnp.where(valid, float(E) * speed * (W * H) / M, 0.0)
    w = jax.lax.stop_gradient(w)
    cx = dl.x * w * xn_motion
    cy = dl.y * w * xn_motion
    cz = dl.z * w * xn_motion

    j = morton_encode(px.astype(jnp.uint32), py.astype(jnp.uint32))
    j = jnp.where(valid, j, jnp.uint32(num_pixels))  # dropped
    zero = jnp.zeros((num_pixels,), jnp.float32)
    return Vec3(
        zero.at[j].add(cx, mode="drop"),
        zero.at[j].add(cy, mode="drop"),
        zero.at[j].add(cz, mode="drop"),
    )
