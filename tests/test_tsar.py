"""End-to-end TSAR refinement: PatchMatch + weak-region repair on the
synthetic scene. The flat (textureless) rectangle is unrecoverable by raw
PatchMatch (NCC variance guard -> MAXCOST) and must be repaired by the
region-RANSAC fill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.models import patchmatch as pm
from tsar_mvs_tpu.models import tsar
from tsar_mvs_tpu.models import weak_texture as wt


@pytest.mark.slow
def test_tsar_repairs_textureless_region(scene):
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(
        iterations=6, weak_text_num=25, hough_thr=12, min_line_length=12,
        max_line_gap=3, ransac_iters=2000, ransac_anneal_rounds=200,
        # The toy 128-px scene has ~16x coarser depth resolution than the
        # ETH3D scale the reference constants assume.
        ransac_thr_base=0.005, ransac_thr_max=0.05, ransac_thr_step=0.002,
        wmf_drift_thr=2.0,
    ).with_depth_range(scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = (1, 2, 3, 4)
    key = jax.random.PRNGKey(0)

    state = pm.run_patchmatch_pyramid(
        key, imgs, view_ids, list(scene.P), params, levels=(2, 1),
        iterations_per_level=(6, 4), depth_min=scene.depth_min,
        depth_max=scene.depth_max)
    weak = wt.detect_weak_texture(scene.images[0], params, pyr_levels=1)
    result = tsar.tsar_refine(scene.images, cams, view_ids, params, state,
                              weak, None, jax.random.PRNGKey(7),
                              wmf_final_iters=3)

    gt = scene.depth[0]
    weak_gt = scene.weak_mask[0] & np.isfinite(gt)
    # Erode the GT weak mask so window-straddling border pixels don't count.
    from scipy import ndimage
    weak_core = ndimage.binary_erosion(weak_gt, iterations=4)

    raw_depth = np.asarray(pm.depth_map(state, cams))
    raw_err = np.abs(raw_depth - gt) / gt
    ref_err = np.abs(result.depth - gt) / gt

    # Pyramid PatchMatch leaves a tail of bad pixels in the flat core
    # (windows never span it); TSAR's region fill must flatten that tail.
    assert np.median(ref_err[weak_core]) < 0.02, \
        np.median(ref_err[weak_core])
    assert (ref_err[weak_core] < 0.05).mean() > 0.9, \
        (ref_err[weak_core] < 0.05).mean()
    assert (ref_err[weak_core] < 0.05).mean() >= \
        (raw_err[weak_core] < 0.05).mean() - 0.02
    # And textured regions stay good.
    ok = np.isfinite(gt) & ~scene.weak_mask[0]
    interior = np.zeros_like(ok)
    interior[8:-8, 8:-8] = ok[8:-8, 8:-8]
    assert np.median(ref_err[interior]) < 0.01
    # Outputs well-formed.
    assert result.normal_world.shape == gt.shape + (3,)
    nrm = np.linalg.norm(result.normal_cam, axis=-1)
    np.testing.assert_allclose(nrm[np.isfinite(nrm)], 1.0, atol=1e-3)


def test_border_check_vetoes_bad_region_plane(scene):
    """fake_depth_stage + border_consistency_check (gipuma.cu:1852-1877,
    main.cpp:1735-1780): a region plane far off the surrounding depth
    produces a large border jump; a GT-consistent plane a small one."""
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(
        weak_text_num=25, hough_thr=12, min_line_length=12,
        max_line_gap=3).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    weak = wt.detect_weak_texture(scene.images[0], params, pyr_levels=1)
    regions = np.nonzero(weak.text == -1)[0]
    assert regions.size > 0
    region = int(regions[np.argmax(weak.size[regions])])

    gt = scene.depth[0]
    disp = np.asarray(geo.disparity_depth(
        float(cams.f), float(cams.baseline),
        jnp.asarray(np.where(np.isfinite(gt), gt, scene.depth_max))))
    labels = jnp.asarray(weak.labels_full)
    weak_region = jnp.asarray(weak.text == -1)

    # GT-consistent plane for the region: fit to backprojected GT points.
    rays = np.asarray(geo.pixel_rays(cams, *gt.shape))
    m = (weak.labels_full == region) & np.isfinite(gt)
    pts = gt[m][:, None] * rays[m]
    cen = pts.mean(0)
    _, _, vt = np.linalg.svd(pts - cen, full_matrices=False)
    n = vt[2] / np.linalg.norm(vt[2])
    good = np.zeros((weak.num_regions, 4), np.float32)
    good[region, :3] = n
    good[region, 3] = -float(n @ cen)
    # Off-surface plane: same normal, offset shifted 20% closer.
    bad = good.copy()
    bad[region, 3] *= 0.8

    jumps = {}
    for name, planes in (("good", good), ("bad", bad)):
        fake = np.asarray(tsar.fake_depth_stage(
            cams, jnp.asarray(planes), labels, weak_region, params))
        jump = tsar.border_consistency_check(weak, fake, disp, cams)
        jumps[name] = float(jump[region])
    assert jumps["bad"] > 5.0 * max(jumps["good"], 1e-6), jumps
    thr = params.border_check_thr * params.depth_min
    assert jumps["bad"] > thr
    assert jumps["good"] < thr, jumps


def test_prior_drift_revert(scene):
    """gipuma_compute_disp_final revert semantics (gipuma.cu:757-808):
    pixels drifted > thr disparities from the prior revert to it."""
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    H, W = scene.depth[0].shape
    gt = np.where(np.isfinite(scene.depth[0]), scene.depth[0],
                  scene.depth_max)
    rays = geo.pixel_rays(cams, H, W)
    n = jnp.asarray(np.broadcast_to([0.0, 0.0, -1.0], (H, W, 3)),
                    jnp.float32)
    d_prior = geo.plane_d_from_depth(n, rays, jnp.asarray(gt, jnp.float32))
    # Perturb half the image far beyond the drift threshold.
    half = np.zeros((H, W), bool)
    half[:, W // 2:] = True
    depth_bad = np.where(half, gt * 2.0, gt).astype(np.float32)
    d_bad = geo.plane_d_from_depth(n, rays, jnp.asarray(depth_bad))
    state = pm.PlaneState(normal=n, d=d_bad,
                          cost=jnp.zeros((H, W)), ratio=jnp.zeros((H, W)),
                          best_view=jnp.zeros((H, W), jnp.int32))
    out = tsar.prior_drift_revert(cams, state, n, d_prior, drift_thr=6.0)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth_out = np.asarray(geo.depth_from_plane(cams, out.normal, out.d,
                                                xx, yy))
    np.testing.assert_allclose(depth_out[half], gt[half], rtol=1e-4)
    np.testing.assert_allclose(depth_out[~half], gt[~half], rtol=1e-4)
