"""Primary-visibility boundary gradients (diff/edge_sampling.py).

The interior estimator is blind to silhouette motion: translating an
occluder that is uniformly shaded produces ~zero interior vertex gradient,
while the true derivative of the pixel-integrated image is the swept-area
term. These tests validate the edge-sampled boundary term against central
finite differences of high-spp jittered renders (common random numbers)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudapathtracer_tpu import RenderConfig, make_camera
from cudapathtracer_tpu.diff import render_grad as rg
from cudapathtracer_tpu.diff.edge_sampling import (
    EdgeTable,
    build_edge_table,
    boundary_image,
)
from cudapathtracer_tpu.models import procedural
from cudapathtracer_tpu.models.scene import make_scene
from cudapathtracer_tpu.render.renderer import build_bvh_for_scene


def occluder_scene():
    """Cornell box (no boxes) + a floating dark quad in front of the back
    wall; its 4 vertices are private to the quad, so moving them is pure
    silhouette motion of a flat, uniformly-lit occluder."""
    cb = procedural.cornell_box(with_boxes=False)
    verts = cb["verts"].tolist()
    tris = cb["tris"].tolist()
    mats = cb["tri_mats"].tolist()
    base = len(verts)
    # dark quad at z = 0.2, spanning x in [-0.4, 0.1], y in [0.6, 1.2]
    q = [(-0.4, 0.6, 0.2), (0.1, 0.6, 0.2), (0.1, 1.2, 0.2),
         (-0.4, 1.2, 0.2)]
    verts.extend(q)
    tris.extend([(base, base + 1, base + 2), (base, base + 2, base + 3)])
    albedo = np.concatenate([cb["albedo"], [[0.05, 0.05, 0.05]]])
    emission = np.concatenate([cb["emission"], [[0.0, 0.0, 0.0]]])
    mats.extend([4, 4])
    scene = make_scene(np.array(verts, np.float32),
                       np.array(tris, np.int32),
                       np.array(mats, np.int32), albedo, emission)
    quad_vert_ids = [base, base + 1, base + 2, base + 3]
    return scene, np.array(tris, np.int32), quad_vert_ids


def test_edge_table_structure():
    _, tris, _ = occluder_scene()
    et = build_edge_table(tris)
    ev0 = np.asarray(et.ev0)
    ev1 = np.asarray(et.ev1)
    assert (ev0 < ev1).all()
    # every quad contributes 2 tris sharing a diagonal: interior edges have
    # fb >= 0, border edges fb == -1
    fb = np.asarray(et.fb)
    assert (fb >= 0).sum() >= 7  # 7 quads -> 7 shared diagonals
    # no duplicate undirected edges
    keys = ev0.astype(np.int64) * 1_000_000 + ev1
    assert np.unique(keys).size == keys.size


def test_boundary_image_value_is_zero():
    scene, tris, _ = occluder_scene()
    et = build_edge_table(tris)
    cam = make_camera(width=16, height=16)

    def radiance_stub(o, d, kidx):
        from cudapathtracer_tpu.ops.vecmath import Vec3
        return Vec3.full(o.x.shape, 1.0, 2.0, 3.0)

    img = boundary_image(scene, cam, et, radiance_stub,
                         jax.random.PRNGKey(0), 256, 256)
    assert float(jnp.abs(img.x).max()) == 0.0
    assert float(jnp.abs(img.z).max()) == 0.0


def test_silhouette_gradient_matches_fd():
    """d(mean image)/d(occluder x-translation): interior-only misses it,
    edge sampling recovers it within Monte-Carlo tolerance."""
    scene, tris, qids = occluder_scene()
    et = build_edge_table(tris)
    size = 32
    cam = make_camera(width=size, height=size)
    cfg = RenderConfig(width=size, height=size, spp=1, integrator="pt_nee",
                       jitter=True, traversal="brute")
    key = jax.random.PRNGKey(42)
    SPP = 48       # for the autodiff evaluations
    SPP_FD = 192   # the FD reference needs ~4x more: its signal lives in
    #                the one-pixel silhouette band and common-random-number
    #                cancellation leaves that band's jitter noise (measured:
    #                at 48 spp the FD estimate can even flip sign)
    ES = 8192

    qsel = jnp.zeros((scene.num_verts,), jnp.float32).at[
        jnp.asarray(qids)].set(1.0)

    def mean_img(dx, edge_samples, spp=SPP):
        verts = scene.verts._replace(x=scene.verts.x + dx * qsel)
        s = scene._replace(verts=verts)
        img = rg.render_image_diff(
            s, cam, cfg, key, spp,
            edge_samples=edge_samples, edge_table=et if edge_samples else
            None)
        return (jnp.mean(img.x) + jnp.mean(img.y) + jnp.mean(img.z)) / 3.0

    # autodiff, with and without the boundary term
    g_int = float(jax.grad(mean_img)(0.0, 0))
    g_edge = float(jax.grad(mean_img)(0.0, ES))

    # central finite difference on the primal (eps spans ~1 pixel so the
    # jittered estimator resolves the swept band)
    eps = 4.0 / size * 0.5
    fd = (float(mean_img(eps, 0, SPP_FD))
          - float(mean_img(-eps, 0, SPP_FD))) / (2 * eps)

    print(f"fd={fd:.5f} interior={g_int:.5f} with_edges={g_edge:.5f}")
    assert np.isfinite(fd) and np.isfinite(g_edge)
    # the occluder is uniform: interior alone misses most of the signal
    assert abs(g_int - fd) > abs(g_edge - fd), (
        f"boundary term did not improve: fd={fd} int={g_int} edge={g_edge}"
    )
    # and the boundary-corrected gradient is in the right ballpark
    assert abs(g_edge - fd) <= 0.35 * abs(fd) + 5e-3, (
        f"fd={fd} edge={g_edge}"
    )
