"""Fusion consistency-vote tests on ground-truth depth maps."""

import numpy as np

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import FusionParams
from tsar_mvs_tpu.models import fusion


def _world_points(scene, v):
    """GT 3-D points of view v via its camera (numpy oracle)."""
    H, W = scene.depth.shape[1:]
    K_inv = np.linalg.inv(scene.K)
    R, t = scene.R[v], scene.t[v]
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    pix = np.stack([xx, yy, np.ones_like(xx)], -1)
    rays = pix @ K_inv.T
    Xc = rays * scene.depth[v][..., None]
    return (Xc - t) @ R  # R^T (Xc - t)


def test_fuse_gt_depthmaps(scene):
    cams = geo.build_camera_set(list(scene.P), rebase=False)
    depths = np.where(np.isfinite(scene.depth), scene.depth, 0.0)
    fp = FusionParams(used_list=False)
    cloud = fusion.fuse(depths.astype(np.float32),
                        scene.normal_world.astype(np.float32), cams,
                        scene.images, fp)
    H, W = depths.shape[1:]
    assert cloud.points.shape[0] > 0.5 * H * W  # most pixels fuse

    # Fused points from view 0 must match the GT world points there.
    sel = cloud.view_of == 0
    gt_pts = _world_points(scene, 0)
    valid0 = np.isfinite(scene.depth[0])
    # Emitted points are a subset of valid pixels; compare via nearest
    # depth statistics instead of pixel identity: all fused points should
    # lie close to *some* GT surface point of view 0.
    from scipy.spatial import cKDTree
    tree = cKDTree(gt_pts[valid0].reshape(-1, 3))
    dist, _ = tree.query(cloud.points[sel], k=1)
    assert np.median(dist) < 0.01
    assert (dist < 0.05).mean() > 0.95


def test_used_list_deduplicates(scene):
    cams = geo.build_camera_set(list(scene.P), rebase=False)
    depths = np.where(np.isfinite(scene.depth), scene.depth, 0.0)
    cloud_all = fusion.fuse(depths.astype(np.float32),
                            scene.normal_world.astype(np.float32), cams,
                            scene.images, FusionParams(used_list=False))
    cloud_dedup = fusion.fuse(depths.astype(np.float32),
                              scene.normal_world.astype(np.float32), cams,
                              scene.images, FusionParams(used_list=True))
    # De-duplication strictly reduces the emitted point count.
    assert cloud_dedup.points.shape[0] < cloud_all.points.shape[0]


def test_inconsistent_depths_rejected(scene):
    """Corrupting one view's depths must suppress fused points that need
    that view for consistency (num_consistent=2)."""
    cams = geo.build_camera_set(list(scene.P), rebase=False)
    depths = np.where(np.isfinite(scene.depth), scene.depth, 0.0)
    fp = FusionParams(used_list=False, num_consistent=2)
    base = fusion.fuse(depths.astype(np.float32),
                       scene.normal_world.astype(np.float32), cams,
                       scene.images, fp)
    bad = depths.copy()
    bad[1:] *= 1.3  # all source views inconsistent with view 0
    corrupted = fusion.fuse(bad.astype(np.float32),
                            scene.normal_world.astype(np.float32), cams,
                            scene.images, fp)
    frac0_base = (base.view_of == 0).sum()
    frac0_bad = (corrupted.view_of == 0).sum()
    assert frac0_bad < 0.1 * max(frac0_base, 1)
