"""NCC cost kernel vs a direct numpy oracle (per-pixel port of
gipuma.cu:229-298 math) and semantic checks on the synthetic scene."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import ncc


@pytest.fixture(scope="module")
def setup(scene):
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    imgs = jnp.asarray(scene.images, jnp.float32)
    params = AlgorithmParams()
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)
    return cams, imgs, params, stats


def _oracle_pm_cost(ref, src, K_ref, K_inv, A, b, n, d, x, y, params):
    """Direct per-pixel bilateral NCC oracle (numpy, float64)."""
    def H_apply(px, py):
        ray = K_inv @ np.array([px, py, 1.0])
        q = A @ np.array([px, py, 1.0]) - b * (n @ ray) / d
        return q[:2] / q[2]

    def sample(img, q):
        H_i, W_i = img.shape
        qx = np.clip(q[0], 0, W_i - 1)
        qy = np.clip(q[1], 0, H_i - 1)
        x0, y0 = int(np.floor(qx)), int(np.floor(qy))
        x1, y1 = min(x0 + 1, W_i - 1), min(y0 + 1, H_i - 1)
        fx, fy = qx - x0, qy - y0
        return (img[y0, x0] * (1 - fy) * (1 - fx)
                + img[y0, x1] * (1 - fy) * fx
                + img[y1, x0] * fy * (1 - fx) + img[y1, x1] * fy * fx)

    cen = ref[y, x]
    s = np.zeros(5)
    wsum = 0.0
    for i in range(-params.hrad, params.hrad + 1, params.win_increment):
        for j in range(-params.vrad, params.vrad + 1, params.win_increment):
            px, py = x + i, y + j
            ref_pix = sample(ref, np.array([px, py], float))
            src_pix = sample(src, H_apply(px, py))
            spatial = np.sqrt(i * i + j * j)
            w = np.exp(-spatial / (2 * params.sigma_spatial ** 2)
                       - abs(ref_pix - cen) / (2 * params.sigma_color ** 2))
            s += w * np.array([ref_pix, ref_pix ** 2, src_pix,
                               src_pix ** 2, ref_pix * src_pix])
            wsum += w
    mr, mrr, ms, mss, mrs = s / wsum
    var_r, var_s = mrr - mr ** 2, mss - ms ** 2
    if var_r < params.min_var or var_s < params.min_var:
        return params.cost_max
    return float(np.clip(1 - (mrs - mr * ms) / np.sqrt(var_r * var_s),
                         0, params.cost_max))


def test_pm_cost_matches_oracle(setup, scene):
    cams, imgs, params, stats = setup
    H, W = scene.images.shape[1:]
    # A tilted plane field (constant plane).
    n = np.array([0.15, -0.1, -0.98])
    n /= np.linalg.norm(n)
    rays = geo.pixel_rays(cams, H, W)
    normal = jnp.asarray(np.broadcast_to(n, (H, W, 3)), jnp.float32)
    depth = jnp.full((H, W), 5.0, jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)

    view = 1
    cost = np.asarray(ncc.pm_cost_view(imgs[view], cams, view, normal, d,
                                       stats, params))

    K_ref = np.asarray(cams.K[0], np.float64)
    K_inv = np.asarray(cams.K_inv[0], np.float64)
    A = np.asarray(cams.A[view], np.float64)
    b = np.asarray(cams.b[view], np.float64)
    ref_np = scene.images[0].astype(np.float64)
    src_np = scene.images[view].astype(np.float64)

    rng = np.random.default_rng(7)
    for _ in range(12):
        x = int(rng.integers(params.hrad + 1, W - params.hrad - 1))
        y = int(rng.integers(params.vrad + 1, H - params.vrad - 1))
        d_xy = float(np.asarray(d)[y, x])
        expected = _oracle_pm_cost(ref_np, src_np, K_ref, K_inv, A, b, n,
                                   d_xy, x, y, params)
        assert cost[y, x] == pytest.approx(expected, abs=3e-3), (x, y)


def test_gt_plane_has_low_cost(setup, scene):
    """The GT surface plane must produce near-zero NCC cost in textured
    regions, and clearly beat a wrong constant-depth plane field."""
    cams, imgs, params, stats = setup
    H, W = scene.images.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    ok = np.isfinite(scene.depth[0]) & ~scene.weak_mask[0]
    normal = jnp.asarray(scene.normal_cam[0], jnp.float32)
    depth = jnp.asarray(np.where(np.isfinite(scene.depth[0]),
                                 scene.depth[0], 5.0), jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)

    res = ncc.multiview_cost(imgs, (1, 2), cams, normal, d, stats, params)
    cost_gt = np.asarray(res.cost)

    depth_bad = depth * 1.15
    d_bad = geo.plane_d_from_depth(normal, rays, depth_bad)
    res_bad = ncc.multiview_cost(imgs, (1, 2), cams, normal, d_bad, stats,
                                 params)
    cost_bad = np.asarray(res_bad.cost)

    interior = np.zeros_like(ok)
    m = 8
    interior[m:-m, m:-m] = ok[m:-m, m:-m]
    assert np.median(cost_gt[interior]) < 0.1
    assert np.median(cost_bad[interior]) > 5 * np.median(cost_gt[interior])


def test_multiview_aggregation_semantics(setup, scene):
    """n_best=1 returns the per-pixel min view cost; ratio = best/second;
    best_view indexes the winning source view."""
    cams, imgs, params, stats = setup
    H, W = scene.images.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    normal = jnp.asarray(scene.normal_cam[0], jnp.float32)
    depth = jnp.asarray(np.where(np.isfinite(scene.depth[0]),
                                 scene.depth[0], 5.0), jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)

    view_ids = (1, 2, 3)
    per_view = [np.asarray(ncc.pm_cost_view(imgs[v], cams, v, normal, d,
                                            stats, params))
                for v in view_ids]
    res = ncc.multiview_cost(imgs, view_ids, cams, normal, d, stats, params)
    stacked = np.stack(per_view)
    srt = np.sort(stacked, axis=0)
    valid = (stacked < ncc.MAXCOST).sum(axis=0)
    exp_cost = np.where(valid > 0, srt[0], ncc.MAXCOST)
    np.testing.assert_allclose(np.asarray(res.cost), exp_cost, atol=1e-5)
    exp_best = np.asarray(view_ids)[np.argmin(stacked, axis=0)]
    has = valid > 0
    np.testing.assert_array_equal(np.asarray(res.best_view)[has],
                                  exp_best[has])
    np.testing.assert_allclose(np.asarray(res.ratio)[has],
                               (srt[0] / srt[1])[has], atol=1e-5)


def test_rl_cost_runs_and_is_finite(setup, scene):
    cams, imgs, params, stats = setup
    H, W = scene.images.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    normal = jnp.asarray(scene.normal_cam[0], jnp.float32)
    depth = jnp.asarray(np.where(np.isfinite(scene.depth[0]),
                                 scene.depth[0], 5.0), jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)
    res = ncc.multiview_cost(imgs, (1, 2), cams, normal, d, stats, params)
    rl = ncc.rl_cost_view(imgs[0], imgs, res.best_view, (1, 2), cams,
                          normal, d, params)
    rl_np = np.asarray(rl)
    assert np.isfinite(rl_np).all()
    assert (rl_np >= 0).all() and (rl_np <= 2.0).all()
    # Forward and reverse cost should agree on well-textured GT surface.
    ok = np.isfinite(scene.depth[0]) & ~scene.weak_mask[0]
    interior = np.zeros_like(ok)
    interior[10:-10, 10:-10] = ok[10:-10, 10:-10]
    diff = np.abs(rl_np - np.asarray(res.cost))
    assert np.median(diff[interior]) < 0.1


def test_rl_cost_fused_matches_per_view(setup, scene):
    """The fused best-view reverse cost must equal the dense
    evaluate-every-view-and-mask formulation bit-for-bit (same f32
    sampling path, per-pixel factor selection on the VPU)."""
    cams, imgs, params, stats = setup
    H, W = scene.images.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    normal = jnp.asarray(scene.normal_cam[0], jnp.float32)
    depth = jnp.asarray(np.where(np.isfinite(scene.depth[0]),
                                 scene.depth[0], 5.0), jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)
    res = ncc.multiview_cost(imgs, (1, 2), cams, normal, d, stats, params)
    rl_ref = ncc.rl_cost_view(imgs[0], imgs, res.best_view, (1, 2), cams,
                              normal, d, params)
    rl_fused = ncc.rl_cost_fused(imgs[0], imgs, res.best_view, (1, 2),
                                 cams, normal, d, params)
    np.testing.assert_allclose(np.asarray(rl_fused), np.asarray(rl_ref),
                               rtol=2e-5, atol=2e-5)
