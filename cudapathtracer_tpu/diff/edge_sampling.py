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

Scope/assumptions (documented limitations): pinhole camera (aperture 0 —
defocus blurs the boundary anyway), box pixel filter (matches the
renderer's jittered pixel integral), triangle geometry (sphere silhouettes
are smooth in theta except at the horizon — their interior gradient
already captures first-order motion). PRIMARY visibility is handled by
``boundary_image``; SECONDARY (NEE shadow) visibility by
``shadow_boundary_image`` below; deeper-bounce indirect silhouettes remain
interior-estimated.
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
                   offset_film: float = 2e-4,
                   tile_offset=0, tile_pixels: int | None = None) -> Vec3:
    """The boundary-gradient image: (R,) Vec3 whose VALUE is exactly zero
    and whose vertex cotangents carry the silhouette term.

    radiance_fn(o, d, keys_idx) -> Vec3: one-sample radiance estimate for
    rays (o, d); must already be the DETACHED estimator (its own gradient
    is irrelevant here — stop_gradient is applied to its output anyway).

    Tile sharding: ``tile_offset``/``tile_pixels`` restrict the SCATTER to
    the Morton-contiguous pixel range [offset, offset+tile_pixels). Every
    chip draws the same global samples (same key => same values), so the
    per-chip images sum to exactly the single-chip image — no collectives,
    bit-reproducible (parallel/shard.make_train_step relies on this).
    """
    E = edges.num_edges
    M = int(num_samples)
    if tile_pixels is None:
        tile_pixels = num_pixels
    if E == 0:
        # jax.random.randint with an empty [0, 0) range is undefined — an
        # edge-free mesh simply has no silhouette term
        z = jnp.zeros((tile_pixels,), jnp.float32)
        return Vec3(z, z, z)
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
    # tile-local scatter: uint32 subtraction wraps out-of-tile pixels to
    # huge indices, which mode="drop" discards
    j = j - jnp.uint32(tile_offset)
    zero = jnp.zeros((tile_pixels,), jnp.float32)
    return Vec3(
        zero.at[j].add(cx, mode="drop"),
        zero.at[j].add(cy, mode="drop"),
        zero.at[j].add(cz, mode="drop"),
    )


def shadow_boundary_image(scene, cam, edges: EdgeTable, trace_fn,
                          shade_normal_fn, key, num_samples: int,
                          num_pixels: int, branch_factor: float = 0.5,
                          light_normal_mode: str = "fixed",
                          vis_eps: float = 1e-2,
                          offset_area: float = 2e-3,
                          tile_offset=0,
                          tile_pixels: int | None = None) -> Vec3:
    """Secondary-visibility boundary term: NEE shadow silhouettes.

    The direct term of the PT+NEE estimator at the primary hit x is an
    area integral over the lights, L_d(x) = ∫_A f(x, y) V(x, y) dA(y)
    (kernel.cu:467-507 semantics). An occluder edge, seen FROM x, projects
    to a curve Γ_A on the light plane; as occluder vertices move, Γ_A
    sweeps across A and the boundary term is the line integral

        dL_d/dθ = ∮_{Γ_A} f(y*) (V⁻ − V⁺) (n̂·dy*/dθ) ds,

    with y* the projection of an edge point z along x→z onto the light
    plane, n̂ the in-plane unit normal of Γ_A, and V∓ the visibilities on
    the two sides (reference visibility test |t − len| ≤ 0.01,
    kernel.cu:405). Estimated exactly like the primary term: sample
    (pixel, edge, u, light) uniformly, emit a value-zero/gradient-carrying
    contribution into the pixel.

    Scope (documented): the bounce-0 direct shadow only — the dominant
    shadow term for image losses; deeper-bounce shadow silhouettes remain
    interior-estimated. ``branch_factor`` matches the estimator's NEE
    branch weight (0.5 by default: the reference's uncompensated 50/50,
    kernel.cu:459; 1.0 with branch_pdf_correction). Light geometry is
    treated as fixed (gradients target the OCCLUDER, the term named in
    the r1 verdict); x is detached (its motion is the interior term's
    job).

    trace_fn(o, d, mask) -> Hit (closest hit; detached is fine).
    shade_normal_fn(tri) -> (normal Vec3, albedo Vec3) at hit triangles.
    """
    from ..utils.constants import EPS_HIT, MAX_FLOAT, PI_REF

    E = edges.num_edges
    M = int(num_samples)
    L = int(scene.lights.shape[0])
    if tile_pixels is None:
        tile_pixels = num_pixels
    if L == 0 or E == 0:
        # no lights -> no NEE term; no edges -> randint(0, 0) undefined
        z = jnp.zeros((tile_pixels,), jnp.float32)
        return Vec3(z, z, z)
    kp, ke, ku, kl = jax.random.split(key, 4)
    pix = jax.random.randint(kp, (M,), 0, num_pixels).astype(jnp.uint32)
    eidx = jax.random.randint(ke, (M,), 0, E)
    u = jax.random.uniform(ku, (M,))
    lidx = jax.random.randint(kl, (M,), 0, L)

    # ---- primary hit x for the sampled pixels (all detached) --------------
    from ..utils.morton import morton_decode

    xpix, ypix = morton_decode(pix)
    fx = xpix.astype(jnp.float32) / cam.width - 0.5
    fy = ypix.astype(jnp.float32) / cam.height - 0.5
    o, d = _rays_from_film(cam, fx, fy)
    hit = trace_fn(o, d, jnp.ones((M,), bool))
    t = hit.t - EPS_HIT
    missed = t > MAX_FLOAT - 1.0
    x = o + d * jax.lax.stop_gradient(jnp.where(missed, 0.0, t))
    x = Vec3(*(jax.lax.stop_gradient(c) for c in (x.x, x.y, x.z)))
    tri0 = jnp.maximum(jax.lax.stop_gradient(hit.tri), 0)
    n_x, alb_x = shade_normal_fn(tri0)

    # ---- edge point z (attached to verts) ---------------------------------
    va = gather(scene.verts, jnp.take(edges.ev0, eidx, mode="clip"))
    vb = gather(scene.verts, jnp.take(edges.ev1, eidx, mode="clip"))
    z = va + (vb - va) * u

    # silhouette as seen from x (detached)
    fa = jnp.take(edges.fa, eidx, mode="clip")
    fb = jnp.take(edges.fb, eidx, mode="clip")
    na = gather(scene.tri_norm, fa)
    nb = gather(scene.tri_norm, jnp.maximum(fb, 0))
    w_ = z - x  # x -> z
    sa = na.x * w_.x + na.y * w_.y + na.z * w_.z
    sb = nb.x * w_.x + nb.y * w_.y + nb.z * w_.z
    silhouette = jax.lax.stop_gradient((fb < 0) | (sa * sb < 0.0))

    # ---- project along x->z onto the light plane (light fixed) ------------
    lt = jnp.take(scene.lights, lidx, mode="clip")
    lv0 = Vec3(*(jax.lax.stop_gradient(c) for c in gather(
        scene.verts, jnp.take(scene.tri_v0, lt, mode="clip"))))
    lv1 = Vec3(*(jax.lax.stop_gradient(c) for c in gather(
        scene.verts, jnp.take(scene.tri_v1, lt, mode="clip"))))
    lv2 = Vec3(*(jax.lax.stop_gradient(c) for c in gather(
        scene.verts, jnp.take(scene.tri_v2, lt, mode="clip"))))
    n_l = Vec3(*(jax.lax.stop_gradient(c) for c in gather(
        scene.tri_norm, lt)))
    emi = Vec3(*(jax.lax.stop_gradient(c) for c in gather(
        scene.mat_emission, jnp.take(scene.tri_mat, lt, mode="clip"))))

    nw = n_l.x * w_.x + n_l.y * w_.y + n_l.z * w_.z
    nw_safe = jnp.where(jnp.abs(nw) < 1e-12, 1e-12, nw)
    dplx = lv0.x - x.x
    dply = lv0.y - x.y
    dplz = lv0.z - x.z
    s = (n_l.x * dplx + n_l.y * dply + n_l.z * dplz) / nw_safe
    ystar = Vec3(x.x + s * w_.x, x.y + s * w_.y, x.z + s * w_.z)

    # in-triangle test for y* (detached barycentric)
    def _det(p):
        e1 = Vec3(lv1.x - lv0.x, lv1.y - lv0.y, lv1.z - lv0.z)
        e2 = Vec3(lv2.x - lv0.x, lv2.y - lv0.y, lv2.z - lv0.z)
        vp = Vec3(p.x - lv0.x, p.y - lv0.y, p.z - lv0.z)
        d11 = e1.x * e1.x + e1.y * e1.y + e1.z * e1.z
        d12 = e1.x * e2.x + e1.y * e2.y + e1.z * e2.z
        d22 = e2.x * e2.x + e2.y * e2.y + e2.z * e2.z
        dp1 = vp.x * e1.x + vp.y * e1.y + vp.z * e1.z
        dp2 = vp.x * e2.x + vp.y * e2.y + vp.z * e2.z
        den = d11 * d22 - d12 * d12
        den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        bu = (d22 * dp1 - d12 * dp2) / den
        bv = (d11 * dp2 - d12 * dp1) / den
        return (bu >= 0) & (bv >= 0) & (bu + bv <= 1.0)

    inside = jax.lax.stop_gradient(_det(
        Vec3(*(jax.lax.stop_gradient(c) for c in ystar))))

    # ---- curve tangent/normal on the light plane (detached) ---------------
    wu = Vec3(vb.x - va.x, vb.y - va.y, vb.z - va.z)  # dz/du
    ds_du = -s * (n_l.x * wu.x + n_l.y * wu.y + n_l.z * wu.z) / nw_safe
    tax = s * wu.x + w_.x * ds_du
    tay = s * wu.y + w_.y * ds_du
    taz = s * wu.z + w_.z * ds_du
    tax, tay, taz = (jax.lax.stop_gradient(c) for c in (tax, tay, taz))
    # in-plane normal = normalize(cross(n_l, t_A))
    nhx = n_l.y * taz - n_l.z * tay
    nhy = n_l.z * tax - n_l.x * taz
    nhz = n_l.x * tay - n_l.y * tax
    nlen = jnp.sqrt(nhx * nhx + nhy * nhy + nhz * nhz)
    speed = jnp.sqrt(tax * tax + tay * tay + taz * taz)
    inv = jnp.where(nlen > 1e-12, 1.0 / jnp.maximum(nlen, 1e-12), 0.0)
    nhx, nhy, nhz = nhx * inv, nhy * inv, nhz * inv

    # ---- two-sided visibility probes (reference test, kernel.cu:405) ------
    ysd = Vec3(*(jax.lax.stop_gradient(c) for c in ystar))

    def vis(side):
        yy = Vec3(ysd.x + side * offset_area * nhx,
                  ysd.y + side * offset_area * nhy,
                  ysd.z + side * offset_area * nhz)
        dv = Vec3(yy.x - x.x, yy.y - x.y, yy.z - x.z)
        ln = jnp.sqrt(dv.x * dv.x + dv.y * dv.y + dv.z * dv.z)
        ln_s = jnp.maximum(ln, 1e-12)
        dirv = Vec3(dv.x / ln_s, dv.y / ln_s, dv.z / ln_s)
        h = trace_fn(x + dirv * EPS_HIT, dirv, jnp.ones((M,), bool))
        return (jnp.abs(h.t - ln) <= vis_eps).astype(jnp.float32), dirv, ln

    v_m, dir_m, _ = vis(-1.0)
    v_p, dir_p, dlen = vis(+1.0)
    dv_vis = jax.lax.stop_gradient(v_m - v_p)

    # ---- NEE integrand f(y*) (detached; integrator semantics) -------------
    cos_x = jnp.maximum(0.0, dir_p.x * n_x.x + dir_p.y * n_x.y
                        + dir_p.z * n_x.z)
    if light_normal_mode == "fixed":
        cos_l = jnp.maximum(0.0, dir_p.y)  # dot((0,-1,0), -dir)
    else:
        cos_l = jnp.maximum(
            0.0, -(n_l.x * dir_p.x + n_l.y * dir_p.y + n_l.z * dir_p.z))
    d2 = jnp.maximum(dlen * dlen, 1e-12)
    f_r = alb_x.x * (1.0 / PI_REF) * cos_x * cos_l / d2 * emi.x
    f_g = alb_x.y * (1.0 / PI_REF) * cos_x * cos_l / d2 * emi.y
    f_b = alb_x.z * (1.0 / PI_REF) * cos_x * cos_l / d2 * emi.z
    f_r, f_g, f_b = (jax.lax.stop_gradient(c) for c in (f_r, f_g, f_b))

    # ---- value-zero, gradient-carrying assembly ---------------------------
    mterm = nhx * ystar.x + nhy * ystar.y + nhz * ystar.z
    motion = mterm - jax.lax.stop_gradient(mterm)

    valid = (silhouette & inside & (s > 1.0 + 1e-6)
             & jnp.logical_not(missed) & (speed > 1e-12))
    w = jnp.where(valid,
                  float(E) * float(L) * speed * float(branch_factor)
                  * float(num_pixels) / M, 0.0)
    w = jax.lax.stop_gradient(w)

    cx = f_r * dv_vis * w * motion
    cy = f_g * dv_vis * w * motion
    cz = f_b * dv_vis * w * motion
    j = jnp.where(valid, pix, jnp.uint32(num_pixels))
    # tile-local scatter (see boundary_image): wrap-to-huge + drop
    j = j - jnp.uint32(tile_offset)
    zeros = jnp.zeros((tile_pixels,), jnp.float32)
    return Vec3(
        zeros.at[j].add(cx, mode="drop"),
        zeros.at[j].add(cy, mode="drop"),
        zeros.at[j].add(cz, mode="drop"),
    )
