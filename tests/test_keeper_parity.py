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
