"""WMF, weak-texture detection, and region-RANSAC tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.models import ransac
from tsar_mvs_tpu.models import weak_texture as wt
from tsar_mvs_tpu.ops import wmf


def test_weighted_median_oracle(rng):
    """_weighted_median vs a direct numpy weighted-median."""
    O = 17
    key = jnp.asarray(rng.standard_normal((O, 4, 5)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.1, 1.0, (O, 4, 5)), jnp.float32)
    med = np.asarray(wmf._weighted_median(key, w))
    for y in range(4):
        for x in range(5):
            k = np.asarray(key)[:, y, x]
            ww = np.asarray(w)[:, y, x]
            order = np.argsort(k)
            cs = np.cumsum(ww[order])
            idx = np.argmax(cs >= cs[-1] / 2)
            assert med[y, x] == pytest.approx(k[order][idx]), (y, x)


def test_wmf_marks_corrupted_patch(scene):
    """Corrupt a patch of a smooth GT plane field; the coarse WMF pass
    must mark the corrupted pixels unreliable and keep the rest."""
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    H, W = scene.images.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    gray = jnp.asarray(scene.images[0], jnp.float32)

    normal = np.array(scene.normal_cam[0])
    depth = np.where(np.isfinite(scene.depth[0]), scene.depth[0], 5.0)
    # Corrupt a 12x12 patch with absurd depth.
    bad = np.zeros((H, W), bool)
    bad[40:52, 60:72] = True
    depth_c = np.where(bad, depth * 3.0, depth)
    n_j = jnp.asarray(normal, jnp.float32)
    depth_j = jnp.asarray(depth_c, jnp.float32)
    d = geo.plane_d_from_depth(n_j, rays, depth_j)
    disp = geo.disparity_depth(cams.f, cams.baseline, depth_j)

    reliable = jnp.ones((H, W), bool)
    for it in range(4):
        reliable = wmf.wmf_mark_outliers(gray, n_j, d, disp, reliable, it,
                                         cams, rays, params)
    rel = np.asarray(reliable)
    # Corrupted interior flagged; clean interior mostly kept.
    assert rel[bad].mean() < 0.2
    clean = ~bad
    clean[:8] = clean[-8:] = False
    clean[:, :8] = clean[:, -8:] = False
    assert rel[clean].mean() > 0.9


def test_wmf_fill_repairs_holes(scene):
    """wmf_fill must repair unreliable textured pixels from neighbors."""
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    H, W = scene.images.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    gray = jnp.asarray(scene.images[0], jnp.float32)

    depth = np.where(np.isfinite(scene.depth[0]), scene.depth[0], 5.0)
    normal = np.array(scene.normal_cam[0])
    bad = np.zeros((H, W), bool)
    bad[30:38, 30:38] = True
    depth_c = np.where(bad, 0.5 * depth, depth)
    n_j = jnp.asarray(normal, jnp.float32)
    depth_j = jnp.asarray(depth_c, jnp.float32)
    d = geo.plane_d_from_depth(n_j, rays, depth_j)
    disp = geo.disparity_depth(cams.f, cams.baseline, depth_j)

    reliable = jnp.asarray(~bad)
    textured = jnp.ones((H, W), bool)
    nn, dd, disp2, rel2 = n_j, d, disp, reliable
    for it in range(3):
        nn, dd, disp2, rel2 = wmf.wmf_fill(gray, nn, dd, disp2, rel2,
                                           textured, it, cams, rays, params)
    depth_fixed = np.asarray(geo.disparity_depth(cams.f, cams.baseline,
                                                 disp2))
    rel_err = np.abs(depth_fixed - depth) / depth
    assert np.asarray(rel2)[bad].mean() > 0.9       # holes got filled
    assert np.median(rel_err[bad]) < 0.05           # with sane depths


def test_ransac_recovers_plane(rng):
    n_true = np.array([0.3, -0.2, 0.93])
    n_true /= np.linalg.norm(n_true)
    d_true = -2.5
    N = 2048
    pts = rng.uniform(-2, 2, (N, 3))
    # Project onto plane + noise.
    off = pts @ n_true + d_true
    pts -= off[:, None] * n_true
    pts += rng.normal(0, 0.001, (N, 3))
    outliers = rng.uniform(-2, 2, (N // 4, 3))
    all_pts = np.concatenate([pts, outliers]).astype(np.float32)
    valid = np.ones(all_pts.shape[0], bool)

    fit = ransac.ransac_plane(jax.random.PRNGKey(1),
                              jnp.asarray(all_pts), jnp.asarray(valid),
                              jnp.float32(0.005), iters=2000,
                              anneal_rounds=100)
    plane = np.asarray(fit.plane)
    if plane[2] * n_true[2] < 0:
        plane = -plane
    assert np.dot(plane[:3], n_true) > 0.999
    assert abs(plane[3] - d_true) < 0.01
    assert int(fit.inliers) > 0.9 * N


def test_roberts_oracle():
    img = np.arange(36, dtype=np.uint8).reshape(6, 6) * 5
    out = wt.roberts(img)
    # Interior: sqrt((I - I_se)^2 + (I_s - I_e)^2).
    i, j = 2, 3
    t1 = (float(img[i, j]) - img[i + 1, j + 1]) ** 2
    t2 = (float(img[i + 1, j]) - img[i, j + 1]) ** 2
    assert out[i, j] == int(np.clip(np.rint(np.sqrt(t1 + t2)), 0, 255))
    assert out[0, 0] == 100 and out[-1, -1] == 100


def test_connect_labels_components():
    edges = np.full((8, 8), 255, np.uint8)
    edges[1:4, 1:4] = 0
    edges[5:7, 5:8] = 0
    labels, counts, weak = wt.connect(edges, weak_text_num=5)
    assert labels[2, 2] == 1          # raster first-encounter order
    assert labels[6, 6] == 2
    assert counts[1] == 9 and counts[2] == 6
    assert weak == [1, 2]


def test_hough_finds_straight_boundary():
    mask = np.zeros((64, 64), bool)
    mask[10, 5:60] = True             # horizontal line, 55 px
    segs = wt.hough_segments(mask, threshold=30, min_line_length=40,
                             max_line_gap=3)
    assert len(segs) == 1
    s = segs[0]
    assert s.y1 == 10 and s.y2 == 10
    assert abs(s.x2 - s.x1) >= 50


def test_detect_weak_texture_finds_flat_region(scene):
    """The synthetic textureless rectangle must come out as a trueweak
    region covering most of the GT weak mask."""
    params = AlgorithmParams(weak_text_num=25, hough_thr=12,
                             min_line_length=12, max_line_gap=3)
    weak = wt.detect_weak_texture(scene.images[0], params, pyr_levels=1)
    weak_px = (weak.text == -1)[weak.labels_full]
    gt = scene.weak_mask[0]
    # Recall: most of the GT flat rect is covered.
    recall = weak_px[gt].mean()
    assert recall > 0.6, recall
    # Precision: detected weak area doesn't balloon over textured surface.
    precision = gt[weak_px].mean() if weak_px.any() else 1.0
    assert precision > 0.5, precision
