"""Quantitative parity against the reference's own golden artifacts.

The reference ships blessed renders (/root/reference/keepers/*.ppm, P3
512x512) of scenes whose OBJs are .gitignored. models/cornell_original.py
reconstructs the standard published CornellBox-Original data; the live
camera is hard-coded (kernel.cu:643-648). Comparison is DISTRIBUTIONAL
(SURVEY.md §7 "RNG sequence semantics"): per-region linear-radiance means,
because (a) RNG streams differ by construction and (b) the keeper scene
includes models/teapot.obj (confirmed by the rounded bright silhouette on
the short box) whose exact mesh is not recoverable — regions are chosen
teapot-free (ceiling, upper back wall, side walls, front floor strip).

Measured findings encoded here (see SURVEY.md §7 keeper-era ledger):

* cornell-original.ppm was rendered WITH the 2x branch-probability
  compensation that the final reference source OMITS (kernel.cu:462-464
  multiplies by BRDF*pi only). Measured: wall-region keeper/ours ratio
  ~2.0 without the correction, ~0.9 with it. The keeper predates the
  final code; RenderConfig(branch_pdf_correction=True) reproduces it.
* With correction on, all five teapot-free regions agree within +-25%
  (residuals consistent with the missing teapot: its floor shadow and
  its reflected light on the back wall).
* BDPT-FirstAttempt.ppm matches our BDPT on side walls / floor / overall
  mean, but its ceiling & upper back wall differ structurally — it is
  literally a "first attempt" predating the final connection weights; we
  assert only the stable regions, loosely.
"""

import os

import numpy as np
import pytest

from cudapathtracer_tpu import RenderConfig
from cudapathtracer_tpu.models.cornell_original import (
    cornell_original_scene,
    reference_camera,
)
from cudapathtracer_tpu.render.renderer import finalize_image, render
from cudapathtracer_tpu.utils.ppm import read_ppm

KEEPERS = "/root/reference/keepers"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(KEEPERS), reason="reference keepers not mounted"
)


from cudapathtracer_tpu.utils.keeper import block32, regions  # noqa: E402


def render_cornell(integrator, spp, **cfg_kw):
    scene = cornell_original_scene()
    cam = reference_camera(128, 128)
    cfg = RenderConfig(width=128, height=128, spp=spp, integrator=integrator,
                       traversal="brute", samples_per_call=spp, **cfg_kw)
    state = render(scene, cam, cfg, seed=1234)
    return finalize_image(state, cfg)[:, ::-1, :]  # keeper x-flip layout


def test_cornell_original_keeper_pt_nee():
    keeper = read_ppm(os.path.join(KEEPERS, "cornell-original.ppm"))
    ours = render_cornell("pt_nee", spp=24, branch_pdf_correction=True)
    rk = regions(block32(keeper))
    ro = regions(block32(ours))
    for name in rk:
        ratio = float((rk[name] / np.maximum(ro[name], 1e-9)).mean())
        assert 0.6 < ratio < 1.6, (
            f"region {name}: keeper/ours linear ratio {ratio:.2f} out of "
            "band (measured ~0.8-1.2 at reconstruction time)"
        )


def test_cornell_original_keeper_requires_branch_correction():
    """The keeper is ~2x our no-correction render in the wall regions —
    i.e. it does NOT match the final source's quirk. Guard the measured
    fact so the ledger claim stays true."""
    keeper = read_ppm(os.path.join(KEEPERS, "cornell-original.ppm"))
    ours = render_cornell("pt_nee", spp=24, branch_pdf_correction=False)
    rk = regions(block32(keeper))
    ro = regions(block32(ours))
    ratio = float((rk["left"] / np.maximum(ro["left"], 1e-9)).mean())
    assert ratio > 1.6, f"expected ~2x without the correction, got {ratio:.2f}"


@pytest.mark.slow
def test_cornell_original_keeper_pt_nee_tight():
    """High-spp variant with variance-derived bands (round-4 verdict item
    8: the loose 0.6-1.6 bands above cannot catch a ~30% radiometric
    regression).

    Band derivation (measured 2026-08, 256^2 / 96 spp / brute /
    branch_pdf_correction=True, recorded in SURVEY.md §7 ledger):
      seed 1234: ceil 0.852  left 0.905  right 0.913  bottom 0.781
      seed 777:  ceil 0.839  left 0.878  right 0.902  bottom 0.809
    Seed-to-seed spread <= 3.5%; residual vs 1.0 is the documented missing
    teapot (shadow + bounce light). Bands = measured center +-12% — wide
    enough for MC + minor estimator drift, tight enough that a x1.3
    emission (or albedo-pipeline) change moves every ratio by 1/1.3 = -23%
    and FAILS (measured: ceil 0.654, left 0.694, right 0.700, bottom
    0.600). upwall (teapot's reflection, ratio 1.52) only guards > 1.3.
    """
    keeper = read_ppm(os.path.join(KEEPERS, "cornell-original.ppm"))
    scene = cornell_original_scene()
    cam = reference_camera(256, 256)
    cfg = RenderConfig(width=256, height=256, spp=96, integrator="pt_nee",
                       traversal="brute", samples_per_call=24,
                       branch_pdf_correction=True)
    state = render(scene, cam, cfg, seed=1234)
    ours = finalize_image(state, cfg)[:, ::-1, :]
    rk = regions(block32(keeper))
    ro = regions(block32(ours))
    bands = dict(ceil=(0.852, 0.12), left=(0.905, 0.12),
                 right=(0.913, 0.12), bottom=(0.781, 0.12))
    for name, (center, tol) in bands.items():
        ratio = float((rk[name] / np.maximum(ro[name], 1e-9)).mean())
        assert center * (1 - tol) < ratio < center * (1 + tol), (
            f"region {name}: keeper/ours {ratio:.3f} outside "
            f"{center}*(1+-{tol}) (measured band, SURVEY §7 ledger)"
        )
    upwall = float((rk["upwall"] / np.maximum(ro["upwall"], 1e-9)).mean())
    assert upwall > 1.3, upwall  # the unrecoverable teapot's reflection


@pytest.mark.slow
def test_bdpt_first_attempt_keeper_tight():
    """High-spp BDPT variant, same derivation discipline (measured
    2026-08, 256^2 / 48 spp / brute): left 0.796, right 0.866, bottom
    0.689, image mean ours 57.8 vs keeper 61.6 (6.2%). ceil (2.25) and
    upwall (0.10) differ structurally — the keeper predates the final
    connection weights — and stay unasserted, as measured at
    reconstruction time."""
    keeper = read_ppm(os.path.join(KEEPERS, "BDPT-FirstAttempt.ppm"))
    scene = cornell_original_scene()
    cam = reference_camera(256, 256)
    cfg = RenderConfig(width=256, height=256, spp=48, integrator="bdpt",
                       traversal="brute", samples_per_call=12)
    state = render(scene, cam, cfg, seed=1234)
    ours = finalize_image(state, cfg)[:, ::-1, :]
    rk = regions(block32(keeper))
    ro = regions(block32(ours))
    bands = dict(left=(0.796, 0.12), right=(0.866, 0.12),
                 bottom=(0.689, 0.12))
    for name, (center, tol) in bands.items():
        ratio = float((rk[name] / np.maximum(ro[name], 1e-9)).mean())
        assert center * (1 - tol) < ratio < center * (1 + tol), (
            f"region {name}: keeper/ours {ratio:.3f} outside "
            f"{center}*(1+-{tol})"
        )
    m_ours = float(ours.astype(np.float64).mean())
    m_keep = float(keeper.astype(np.float64).mean())
    assert abs(m_ours - m_keep) / m_keep < 0.15, (m_ours, m_keep)


def test_bdpt_first_attempt_keeper():
    keeper = read_ppm(os.path.join(KEEPERS, "BDPT-FirstAttempt.ppm"))
    ours = render_cornell("bdpt", spp=12)
    rk = regions(block32(keeper))
    ro = regions(block32(ours))
    for name in ("left", "right", "bottom"):
        ratio = float((rk[name] / np.maximum(ro[name], 1e-9)).mean())
        assert 0.45 < ratio < 1.8, (
            f"region {name}: keeper/ours linear ratio {ratio:.2f}"
        )
    # overall tonemapped brightness within 25%
    m_ours = float(ours.astype(np.float64).mean())
    m_keep = float(keeper.astype(np.float64).mean())
    assert abs(m_ours - m_keep) / m_keep < 0.25, (m_ours, m_keep)
