"""Oracle tests for the gather-free volume-build kernel
(ops/pallas_warp.py) against the exact gather builder, in interpret
mode on CPU. Both paths clamp sample coordinates to the image border;
values must agree to bf16 rounding."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import pallas_warp as pw
from tsar_mvs_tpu.ops import svolume as sv
from tsar_mvs_tpu.utils.synthetic import make_scene


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("TSAR_PALLAS_INTERPRET", "1")


def _setup(H=64, W=128, views=3, seed=0, arc=8.0):
    # Gentle rig (8-degree arc): the tap-based warp kernel requires
    # |dqx/dx - 1| * 128 within the tap budget; the default 40-degree
    # bench arc measures rate deviations of 0.4-1.9 and every view
    # falls back to the gather build (documented boundary, PERF.md).
    scene = make_scene(height=H, width=W, num_views=views, seed=seed,
                       arc_span_deg=arc)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max,
                                       params.svolume_margin)
    imgs = jnp.asarray(scene.images, jnp.float32)
    return scene, cams, params, s_lo, s_hi, imgs


def test_plan_eligibility_boundary():
    """Gentle rigs are eligible; the steep 40-degree bench arc is not
    (and must cleanly report so, not crash)."""
    scene, cams, params, s_lo, s_hi, imgs = _setup(arc=8.0)
    H, W = imgs.shape[1:]
    counts = sv.plane_counts(np.asarray(cams.A)[1:],
                             np.asarray(cams.b)[1:], H, W, s_lo, s_hi,
                             step_px=params.svolume_step_px)
    eligible = 0
    for slot, v in enumerate((1, 2)):
        S = counts[slot]
        ds = (s_hi - s_lo) / (S - 1)
        plan = pw.warp_view_plan(np.asarray(cams.A)[v],
                                 np.asarray(cams.b)[v], H, W, s_lo, ds, S)
        eligible += plan.ok
    assert eligible >= 1

    scene2, cams2, params2, s_lo2, s_hi2, imgs2 = _setup(arc=40.0)
    counts2 = sv.plane_counts(np.asarray(cams2.A)[2:3],
                              np.asarray(cams2.b)[2:3], H, W, s_lo2,
                              s_hi2, step_px=params2.svolume_step_px)
    S2 = counts2[0]
    plan2 = pw.warp_view_plan(np.asarray(cams2.A)[2],
                              np.asarray(cams2.b)[2], H, W, s_lo2,
                              (s_hi2 - s_lo2) / (S2 - 1), S2)
    assert not plan2.ok


def test_warp_build_matches_gather_build():
    scene, cams, params, s_lo, s_hi, imgs = _setup()
    H, W = imgs.shape[1:]
    v = 1
    A = np.asarray(cams.A)[v]
    b = np.asarray(cams.b)[v]
    counts = sv.plane_counts(A, b, H, W, s_lo, s_hi,
                             step_px=params.svolume_step_px)
    S = counts[0]
    ds = (s_hi - s_lo) / (S - 1)
    plan = pw.warp_view_plan(A, b, H, W, s_lo, ds, S)
    assert plan.ok, plan

    vol_gather = sv.build_svolume(imgs[v:v + 1], cams.A[v:v + 1],
                                  cams.b[v:v + 1], s_lo, s_hi, [S])
    vol_warp = pw.build_volume_view_pallas(
        imgs[v], cams.A[v], cams.b[v], float(s_lo), float(ds), S, plan)

    g = np.asarray(vol_gather.data[0], np.float32)
    w = np.asarray(vol_warp, np.float32)
    assert w.shape == g.shape
    # bf16 storage on both sides; interpolation arithmetic differs only
    # in accumulation order -> tight agreement.
    delta = np.abs(g - w)
    assert np.median(delta) < 1e-2, np.median(delta)
    assert np.quantile(delta, 0.999) < 1.5, np.quantile(delta, 0.999)
    assert delta.max() < 4.0, delta.max()


def test_warp_build_through_build_svolume():
    """build_svolume with warp_plans dispatches per view and matches
    the gather build."""
    scene, cams, params, s_lo, s_hi, imgs = _setup()
    H, W = imgs.shape[1:]
    idx = [1, 2]
    A = np.asarray(cams.A)[idx]
    b = np.asarray(cams.b)[idx]
    counts = sv.plane_counts(A, b, H, W, s_lo, s_hi,
                             step_px=params.svolume_step_px)
    plans = []
    for slot in range(2):
        S = counts[slot]
        ds = (s_hi - s_lo) / (S - 1)
        plans.append(pw.warp_view_plan(A[slot], b[slot], H, W, s_lo,
                                       ds, S))
    ids = jnp.asarray(idx, jnp.int32)
    vol_g = sv.build_svolume(imgs[ids], cams.A[ids], cams.b[ids],
                             s_lo, s_hi, counts)
    vol_w = sv.build_svolume(imgs[ids], cams.A[ids], cams.b[ids],
                             s_lo, s_hi, counts,
                             warp_plans=tuple(plans))
    for slot in range(2):
        if not plans[slot].ok:
            continue
        g = np.asarray(vol_g.data[slot], np.float32)
        w = np.asarray(vol_w.data[slot], np.float32)
        delta = np.abs(g - w)
        assert np.quantile(delta, 0.999) < 1.5
