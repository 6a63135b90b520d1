"""Camera geometry and plane algebra.

Host-side camera loading/rebasing is done in float64 numpy; device-side
state is float32 JAX arrays stacked over views.

Conventions (following Hartley & Zisserman, as the reference does —
cameraGeometryUtils.h:15-364):

* P = K [R|t] is 3x4; after rebasing the reference camera is K[I|0] and
  every quantity that feeds the kernels (planes, depths, homographies)
  lives in the rebased reference-camera frame.
* A plane is (n, d) with n·X + d = 0 for 3-D points X in the rebased ref
  frame; `d = -(n·X)` (reference: getD_cu, gipuma.cu:71-86).
* "disparity" is f*baseline/depth with baseline fixed to 1
  (cameraGeometryUtils.h:107-111, main.cpp:1394-1399); the conversion is
  an involution.
* The plane-induced homography from ref to view j is
  H = K_j (R_j - t_j n^T / d) K_ref^-1 (reference: getHomography_cu,
  gipuma.cu:207-224). We evaluate its action in factored form:
      warp(p) = A p~ - b * (n · ray(p)) / d,
  where A = K_j R_j K_ref^-1, b = K_j t_j, ray(p) = K_ref^-1 p~ — the
  same map with per-view matrices hoisted out of the per-pixel loop,
  which keeps the per-pixel work on the VPU to a handful of FMAs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy, float64): loading, decomposition, rebasing
# ---------------------------------------------------------------------------

def rq3(A: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """RQ decomposition of a 3x3 matrix: A = R_up @ Q with R_up upper
    triangular (positive diagonal) and Q orthonormal.

    Equivalent to the K/R split used by cv::decomposeProjectionMatrix.
    """
    # Reverse rows, QR on the transpose, reverse back.
    P_flip = np.flipud(A).T
    Q, R = np.linalg.qr(P_flip)
    R_up = np.flipud(R.T)[:, ::-1]
    Q_out = np.flipud(Q.T)
    # Fix signs so the triangular factor has a positive diagonal.
    S = np.diag(np.sign(np.diag(R_up)))
    R_up = R_up @ S
    Q_out = S @ Q_out
    return R_up, Q_out


def decompose_projection(P: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """P (3x4) -> K (3x3, positive diagonal, K[2,2]=1), R (3x3), C (3,).

    Matches cv::decomposeProjectionMatrix + the reference's post-processing
    (cameraGeometryUtils.h:252-266): the camera center C is the projective
    null-space of P; t = -R C.
    """
    M = P[:, :3]
    K, R = rq3(M)
    if np.linalg.det(R) < 0:
        R = -R
        # K * R unchanged requires flipping K's overall sign too; keep
        # K[2,2] positive below.
    scale = K[2, 2]
    K = K / scale
    # Camera center: the 4-vector C with P C = 0, via the determinant
    # formula (cameraGeometryUtils.h:24-51).
    C = camera_center(P)
    return K, R, C


def camera_center(P: np.ndarray) -> np.ndarray:
    """Projective camera center of P (3x4), dehomogenized to (3,).

    Determinant/null-space method of HZ p.163 (cameraGeometryUtils.h:24-51).
    """
    def det_drop(col: int) -> float:
        cols = [c for c in range(4) if c != col]
        return float(np.linalg.det(P[:, cols]))

    C = np.array([det_drop(0), -det_drop(1), det_drop(2), -det_drop(3)])
    return C[:3] / C[3]


def scale_K(K: np.ndarray, scale_factor: float) -> np.ndarray:
    """Divide focal lengths and principal point by scale_factor
    (cameraGeometryUtils.h:141-151)."""
    Ks = K.copy()
    Ks[0, 0] /= scale_factor
    Ks[1, 1] /= scale_factor
    Ks[0, 2] /= scale_factor
    Ks[1, 2] /= scale_factor
    return Ks


class CameraSet(NamedTuple):
    """Per-view camera parameters, stacked over the view axis (all float32
    jnp arrays; view 0 is the reference, rebased to K[I|0]).

    Mirrors CameraParameters_cu / Camera_cu (camera.h:7-65,
    cameraparameters.h:7-27) with redundant per-pixel-loop matrices
    pre-factored.
    """

    P: jnp.ndarray          # (V, 3, 4) rebased projection matrices
    K: jnp.ndarray          # (V, 3, 3)
    K_inv: jnp.ndarray      # (V, 3, 3)
    R: jnp.ndarray          # (V, 3, 3) rebased rotation
    t: jnp.ndarray          # (V, 3)    rebased translation
    C: jnp.ndarray          # (V, 3)    camera center in rebased frame
    M_inv: jnp.ndarray      # (V, 3, 3) inverse of P[:, :3]
    P_col4: jnp.ndarray     # (V, 3)    fourth column of P
    R_orig: jnp.ndarray     # (V, 3, 3) world->cam rotation before rebase
    R_orig_inv: jnp.ndarray  # (V, 3, 3)
    # Warp factorization for ref->view homographies:
    A: jnp.ndarray          # (V, 3, 3) K_j R_j K_ref^-1
    b: jnp.ndarray          # (V, 3)    K_j t_j
    f: jnp.ndarray          # () scalar: reference focal length K[0,0]
    fy: jnp.ndarray         # ()
    alpha: jnp.ndarray      # () fx/fy of the reference K
    cx: jnp.ndarray         # ()
    cy: jnp.ndarray         # ()
    baseline: jnp.ndarray   # () fixed 1.0 (cameraGeometryUtils.h:309)
    depth_min: jnp.ndarray  # ()
    depth_max: jnp.ndarray  # ()

    @property
    def num_views(self) -> int:
        return self.P.shape[0]


def build_camera_set(P_list: list[np.ndarray], cam_scale: float = 1.0,
                     depth_min: float = -1.0, depth_max: float = -1.0,
                     rebase: bool = True,
                     dtype=jnp.float32) -> CameraSet:
    """Decompose, rescale, and rebase projection matrices so that view 0
    becomes K[I|0]; package everything for the device.

    Mirrors getCameraParameters (cameraGeometryUtils.h:174-364): all views
    share the reference K for P reconstruction (`params.K = scaleK(K[0])`,
    line 280-302 — the reference rebuilds every P as K_ref @ [R|t]).
    """
    V = len(P_list)
    Ks, Rs, Cs, ts = [], [], [], []
    for P in P_list:
        K, R, C = decompose_projection(np.asarray(P, np.float64))
        Ks.append(K)
        Rs.append(R)
        Cs.append(C)
        ts.append(-R @ C)

    K_ref = scale_K(Ks[0], cam_scale)
    K_all = [scale_K(K, cam_scale) for K in Ks]

    # Rebase: transform world so that cam0 = [I|0]
    # (getTransformationReferenceToOrigin, cameraGeometryUtils.h:113-119).
    T0 = np.eye(4)
    T0[:3, :3] = Rs[0]
    T0[:3, 3] = ts[0]
    transform = np.linalg.inv(T0) if rebase else np.eye(4)

    P_out = np.zeros((V, 3, 4))
    R_out = np.zeros((V, 3, 3))
    t_out = np.zeros((V, 3))
    C_out = np.zeros((V, 3))
    M_inv = np.zeros((V, 3, 3))
    K_inv = np.zeros((V, 3, 3))
    A = np.zeros((V, 3, 3))
    b = np.zeros((V, 3))
    R_orig = np.stack(Rs)
    R_orig_inv = np.stack([np.linalg.pinv(R) for R in Rs])

    K_ref_inv = np.linalg.inv(K_ref)
    for i in range(V):
        Ti = np.eye(4)
        Ti[:3, :3] = Rs[i]
        Ti[:3, 3] = ts[i]
        Tn = Ti @ transform
        Rn, tn = Tn[:3, :3], Tn[:3, 3]
        # The reference reconstructs P with the *shared* reference K
        # (transformCamera, cameraGeometryUtils.h:121-139 called with
        # params.K at :302).
        P_out[i] = K_ref @ Tn[:3, :4]
        R_out[i] = Rn
        t_out[i] = tn
        C_out[i] = camera_center(P_out[i])
        M_inv[i] = np.linalg.inv(P_out[i][:, :3])
        K_inv[i] = np.linalg.inv(K_all[i])
        A[i] = K_ref @ Rn @ K_ref_inv
        b[i] = K_ref @ tn

    arr = lambda x: jnp.asarray(x, dtype)
    return CameraSet(
        P=arr(P_out), K=arr(np.stack([K_ref] * V)),
        K_inv=arr(np.stack([K_ref_inv] * V)),
        R=arr(R_out), t=arr(t_out), C=arr(C_out), M_inv=arr(M_inv),
        P_col4=arr(P_out[:, :, 3]), R_orig=arr(R_orig),
        R_orig_inv=arr(R_orig_inv), A=arr(A), b=arr(b),
        f=arr(K_ref[0, 0]), fy=arr(K_ref[1, 1]),
        alpha=arr(K_ref[0, 0] / K_ref[1, 1]),
        cx=arr(K_ref[0, 2]), cy=arr(K_ref[1, 2]),
        baseline=arr(1.0),
        depth_min=arr(depth_min), depth_max=arr(depth_max),
    )


# ---------------------------------------------------------------------------
# Device-side (jnp, float32): plane algebra — all functions broadcast over
# leading pixel dimensions.
#
# NOTE: 3x3 matrix-vector products are unrolled into explicit FMAs rather
# than einsum/dot: tiny dots gain nothing from the MXU and jnp.einsum's
# default TPU precision is bf16, which costs ~0.3 px of warp accuracy.
# Unrolled arithmetic stays on the VPU in full float32.
# ---------------------------------------------------------------------------

def matvec3(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 3) @ (…, 3) -> (…, 3), unrolled float32 FMAs (VPU-only)."""
    return jnp.stack(
        [M[..., 0, 0] * v[..., 0] + M[..., 0, 1] * v[..., 1]
         + M[..., 0, 2] * v[..., 2],
         M[..., 1, 0] * v[..., 0] + M[..., 1, 1] * v[..., 1]
         + M[..., 1, 2] * v[..., 2],
         M[..., 2, 0] * v[..., 0] + M[..., 2, 1] * v[..., 1]
         + M[..., 2, 2] * v[..., 2]], axis=-1)


def disparity_depth(f, baseline, d):
    """disp <-> depth involution f*baseline/d (cameraGeometryUtils.h:107)."""
    return f * baseline / d


def pixel_rays(cams: CameraSet, height: int, width: int) -> jnp.ndarray:
    """ray(p) = K_ref^-1 [x, y, 1]^T for every pixel: (H, W, 3).

    For the rebased reference camera this equals the 3-D point at depth 1
    (get3Dpoint_cu1, gipuma.cu:57-67, with P_col4 = 0, M = K).
    """
    y = jnp.arange(height, dtype=jnp.float32)
    x = jnp.arange(width, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y)
    ones = jnp.ones_like(xx)
    p = jnp.stack([xx, yy, ones], axis=-1)
    return matvec3(cams.K_inv[0], p)


def view_vectors(cams: CameraSet, height: int, width: int) -> jnp.ndarray:
    """Unit viewing-ray directions for the reference camera: (H, W, 3).

    getViewVector_cu (gipuma.cu:97-105): ref center is the origin after
    rebasing, so this is just the normalized pixel ray.
    """
    rays = pixel_rays(cams, height, width)
    return rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)


def plane_d_from_depth(normal: jnp.ndarray, rays: jnp.ndarray,
                       depth: jnp.ndarray) -> jnp.ndarray:
    """Plane offset d with n·X + d = 0 at X = depth * ray.

    getD_cu (gipuma.cu:71-86) specialized to the rebased reference camera
    (P_col4 = 0, M_inv = K^-1): d = -(n · (depth*K^-1 p~)).
    """
    return -depth * jnp.sum(normal * rays, axis=-1)


def depth_from_plane(cams: CameraSet, normal: jnp.ndarray, d: jnp.ndarray,
                     xx: jnp.ndarray, yy: jnp.ndarray) -> jnp.ndarray:
    """Depth induced by plane (n, d) at pixel (x, y).

    getDepthFromPlane3_cu (gipuma.cu:436-442):
        depth = -d*fx / (nx(px-cx) + ny(py-cy)*alpha + nz*fx)
    """
    denom = (normal[..., 0] * (xx - cams.cx)
             + normal[..., 1] * (yy - cams.cy) * cams.alpha
             + normal[..., 2] * cams.f)
    return -d * cams.f / denom


def hemisphere_flip(normal: jnp.ndarray, view_vec: jnp.ndarray) -> jnp.ndarray:
    """Flip normals to face the camera: if n·view > 0, negate
    (vecOnHemisphere_cu, gipuma.cu:106-112)."""
    dp = jnp.sum(normal * view_vec, axis=-1, keepdims=True)
    return jnp.where(dp > 0.0, -normal, normal)


def warp_coords(cams: CameraSet, view: int, points: jnp.ndarray,
                ndotray: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Apply the plane-induced homography of (n, d) to homogeneous ref
    pixels `points` (..., 3), given ndotray = n·ray(p) precomputed.

    Factored form of getHomography_cu + getCorrespondingPoint_cu
    (gipuma.cu:161-171, 207-224): q ~ A p~ - b (n·ray)/d.
    Returns (..., 2) pixel coordinates in the source view.
    """
    Av = cams.A[view]
    bv = cams.b[view]
    q = matvec3(Av, points) - bv * (ndotray / d)[..., None]
    return q[..., :2] / q[..., 2:3]


def homography(cams: CameraSet, view, normal: jnp.ndarray,
               d: jnp.ndarray) -> jnp.ndarray:
    """Explicit 3x3 plane-induced homography H = K(R - t n^T/d)K^-1
    (getHomography_cu, gipuma.cu:207-224). Broadcasts over leading dims
    of normal/d; used by tests and the reverse (rl) cost."""
    Kv = cams.K[view]
    Kinv = cams.K_inv[0]
    R = cams.R[view]
    t = cams.t[view]
    tn = t[..., :, None] * normal[..., None, :]  # (..., 3, 3)
    M = R - tn / d[..., None, None]
    return jnp.einsum("ij,...jk,kl->...il", Kv, M, Kinv,
                      precision="highest")


def backproject(cams: CameraSet, view, xx: jnp.ndarray, yy: jnp.ndarray,
                depth: jnp.ndarray) -> jnp.ndarray:
    """3-D point for pixel (x, y) at `depth` in any view:
    X = M_inv (depth*p~ - P_col4) (get3Dpoint, cameraGeometryUtils.h:53-65).
    Returns (..., 3)."""
    p = jnp.stack([depth * xx - cams.P_col4[view][0],
                   depth * yy - cams.P_col4[view][1],
                   depth - cams.P_col4[view][2]], axis=-1)
    return matvec3(cams.M_inv[view], p)


def project(cams: CameraSet, view, X: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project 3-D points (..., 3) into a view; returns ((..., 2) pixels,
    (...) projective depth w = P3·X~, HZ p.162)."""
    Pv = cams.P[view]
    q = matvec3(Pv[:, :3], X) + Pv[:, 3]
    return q[..., :2] / q[..., 2:3], q[..., 2]


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return v * jax_rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + eps)


def jax_rsqrt(x):
    import jax
    return jax.lax.rsqrt(x)
