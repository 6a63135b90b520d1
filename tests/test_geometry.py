"""Geometry tests against numpy oracles and the synthetic scene's exact
ground truth (oracle ports of gipuma.cu:71-86,207-224,436-442 and
cameraGeometryUtils.h)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo


@pytest.fixture(scope="module")
def cams(scene):
    return geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)


def test_rq3_reconstruction(rng):
    for _ in range(10):
        A = rng.standard_normal((3, 3))
        R_up, Q = geo.rq3(A)
        np.testing.assert_allclose(R_up @ Q, A, atol=1e-10)
        np.testing.assert_allclose(Q @ Q.T, np.eye(3), atol=1e-10)
        assert np.all(np.diag(R_up) >= 0)
        assert np.allclose(np.tril(R_up, -1), 0)


def test_decompose_projection(scene):
    for v in range(scene.num_views):
        K, R, C = geo.decompose_projection(scene.P[v])
        np.testing.assert_allclose(K / K[2, 2], scene.K, atol=1e-6)
        np.testing.assert_allclose(R, scene.R[v], atol=1e-8)
        C_true = -scene.R[v].T @ scene.t[v]
        np.testing.assert_allclose(C, C_true, atol=1e-8)


def test_camera_center_nullspace(scene):
    for v in range(scene.num_views):
        C = geo.camera_center(scene.P[v])
        resid = scene.P[v] @ np.append(C, 1.0)
        np.testing.assert_allclose(resid, 0, atol=1e-6)


def test_rebased_reference_is_canonical(cams, scene):
    """After rebasing, view 0 must be K[I|0] (cameraGeometryUtils.h:268-272)."""
    np.testing.assert_allclose(np.asarray(cams.R[0]), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cams.t[0]), 0, atol=1e-5)
    P0 = np.asarray(cams.P[0])
    np.testing.assert_allclose(P0[:, :3], scene.K, atol=1e-2)
    np.testing.assert_allclose(P0[:, 3], 0, atol=1e-4)


def test_rebase_preserves_relative_geometry(cams, scene):
    """Projection of a world point through original P equals projection of
    the rebased point through rebased P."""
    X_w = np.array([0.3, -0.2, 5.1])
    # Rebased frame = reference camera frame: X_ref = R0 X_w + t0.
    X_ref = scene.R[0] @ X_w + scene.t[0]
    for v in range(scene.num_views):
        q_orig = scene.P[v] @ np.append(X_w, 1.0)
        q_orig = q_orig[:2] / q_orig[2]
        q_new, w = geo.project(cams, v, jnp.asarray(X_ref, jnp.float32))
        np.testing.assert_allclose(np.asarray(q_new), q_orig, atol=2e-2)


def test_plane_depth_involution(cams):
    """depth -> plane d -> depth must be the identity
    (getD_cu o getDepthFromPlane3_cu)."""
    H, W = 96, 128
    rays = geo.pixel_rays(cams, H, W)
    rng = np.random.default_rng(0)
    # Normals within ~35 deg of the optical axis: planes nearly parallel to
    # a viewing ray are numerically ill-posed in float32 (the reference's
    # getDepthFromPlane3_cu has the same conditioning).
    normal = rng.standard_normal((H, W, 3)) * 0.35
    normal[..., 2] = -1.0
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    normal = jnp.asarray(normal, jnp.float32)
    depth = jnp.asarray(rng.uniform(2.0, 10.0, (H, W)), jnp.float32)

    d = geo.plane_d_from_depth(normal, rays, depth)
    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    depth_back = geo.depth_from_plane(cams, normal, d, xx, yy)
    rel = np.abs(np.asarray(depth_back) / np.asarray(depth) - 1.0)
    # float32 conditioning blows up where n·ray is small; bound the bulk
    # tightly and the tail loosely.
    assert np.quantile(rel, 0.999) < 2e-3
    assert rel.max() < 2e-2


def test_homography_matches_factored_warp(cams):
    """warp_coords (factored A p - b n·ray/d) must equal the explicit
    H = K(R - t n^T/d)K^-1 action (gipuma.cu:161-224)."""
    H_img, W_img = 96, 128
    rays = geo.pixel_rays(cams, H_img, W_img)
    rng = np.random.default_rng(1)
    n = np.array([0.2, -0.1, -0.97])
    n /= np.linalg.norm(n)
    normal = jnp.asarray(np.broadcast_to(n, (H_img, W_img, 3)), jnp.float32)
    depth = jnp.full((H_img, W_img), 5.0, jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)

    xx, yy = jnp.meshgrid(jnp.arange(W_img, dtype=jnp.float32),
                          jnp.arange(H_img, dtype=jnp.float32))
    pts = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    ndotray = jnp.sum(normal * rays, axis=-1)

    for v in [1, 3]:
        q_fact = geo.warp_coords(cams, v, pts, ndotray, d)
        Hm = geo.homography(cams, v, normal, d)
        q_h = jnp.einsum("hwij,hwj->hwi", Hm, pts)
        q_h = q_h[..., :2] / q_h[..., 2:3]
        np.testing.assert_allclose(np.asarray(q_fact), np.asarray(q_h),
                                   rtol=1e-3, atol=5e-2)


def test_warp_consistency_with_ground_truth(cams, scene):
    """Warping by the GT plane must land on the pixel that observes the
    same 3-D point: project(backproject(p, gt_depth)) == warp(p)."""
    v = 2
    H, W = scene.depth.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    # GT in the rebased ref frame: view 0's own depths/normals.
    depth0 = scene.depth[0]
    normal0 = scene.normal_cam[0]
    ok = np.isfinite(depth0)
    normal = jnp.asarray(normal0, jnp.float32)
    depth = jnp.asarray(np.where(ok, depth0, 5.0), jnp.float32)
    d = geo.plane_d_from_depth(normal, rays, depth)
    ndotray = jnp.sum(normal * rays, axis=-1)
    xx, yy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    pts = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    q = np.asarray(geo.warp_coords(cams, v, pts, ndotray, d))

    X = np.asarray(geo.backproject(cams, 0, xx, yy, depth))
    q2, w = geo.project(cams, v, jnp.asarray(X))
    q2 = np.asarray(q2)
    # Compare only where the GT plane is the actual surface.
    np.testing.assert_allclose(q[ok], q2[ok], rtol=1e-2, atol=0.25)


def test_backproject_project_identity(cams):
    xx, yy = jnp.meshgrid(jnp.arange(128, dtype=jnp.float32),
                          jnp.arange(96, dtype=jnp.float32))
    depth = jnp.full((96, 128), 4.2, jnp.float32)
    X = geo.backproject(cams, 0, xx, yy, depth)
    q, w = geo.project(cams, 0, X)
    np.testing.assert_allclose(np.asarray(q[..., 0]), np.asarray(xx),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(q[..., 1]), np.asarray(yy),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(w), 4.2, rtol=1e-4)


def test_hemisphere_flip(cams):
    H, W = 8, 8
    vv = geo.view_vectors(cams, H, W)
    n = jnp.asarray(np.broadcast_to([0.0, 0.0, 1.0], (H, W, 3)), jnp.float32)
    flipped = geo.hemisphere_flip(n, vv)
    # view vector z>0, so n·v > 0 -> flip to -z.
    assert np.all(np.asarray(flipped[..., 2]) < 0)


def test_disparity_depth_involution():
    f, b = 150.0, 1.0
    depth = np.array([2.0, 5.0, 10.0])
    disp = geo.disparity_depth(f, b, depth)
    np.testing.assert_allclose(geo.disparity_depth(f, b, disp), depth)
