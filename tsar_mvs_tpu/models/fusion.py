"""Multi-view consistency fusion to a point cloud (fusibile-style).

The reference ships fusion only as a prebuilt binary (`Fusion.exe`) driven
by `x/*.sh` with `--depth_diff=0.01 --angle=15 --num_consistent=1
--reproj_error=2 --used_list=1` (x/1.sh:19-30); the algorithm contract is
the fusibile consistency vote described in SURVEY.md §3.3 and README.md:54:
for each reference pixel, project its 3-D point into every other view's
depthmap; a view is consistent when the relative depth difference, the
normal angle, and the round-trip reprojection error are all within
thresholds; pixels with enough consistent views emit the averaged 3-D
point + normal + color.

TPU-native formulation: one jitted program per reference view computes
all source-view votes as dense (H, W) maps (nearest-neighbor depthmap
lookups are flat gathers); the `used_list` de-duplication is a host-side
mask updated between per-view launches, mirroring the sequential
semantics of the reference CLI flag. Cross-view terms ride a view-sharded
mesh via `parallel.fuse_sharded` when views live on multiple chips.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import FusionParams


@dataclass
class FusedCloud:
    points: np.ndarray    # (N, 3) world frame
    normals: np.ndarray   # (N, 3)
    colors: np.ndarray    # (N,) uint8 gray
    view_of: np.ndarray   # (N,) int32 originating reference view


def _nearest_lookup(img: jnp.ndarray, qx: jnp.ndarray, qy: jnp.ndarray):
    """Nearest-pixel lookup with in-bounds mask. img: (H, W) or (H, W, C)."""
    H, W = img.shape[:2]
    xi = jnp.round(qx).astype(jnp.int32)
    yi = jnp.round(qy).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xi = jnp.clip(xi, 0, W - 1)
    yi = jnp.clip(yi, 0, H - 1)
    if img.ndim == 2:
        vals = img.reshape(-1)[yi * W + xi]
    else:
        vals = img.reshape(-1, img.shape[-1])[yi * W + xi]
    return vals, inb


@functools.partial(jax.jit, static_argnames=("ref", "fp", "num_views"))
def fusion_votes(ref: int, depths: jnp.ndarray, normals: jnp.ndarray,
                 cams: geo.CameraSet, used: jnp.ndarray,
                 fp: FusionParams, num_views: int):
    """Consistency votes for one reference view.

    depths: (V, H, W) metric depths in each view's own frame (0 invalid);
    normals: (V, H, W, 3) world-frame unit normals; cams: *non-rebased*
    CameraSet (world-frame P); used: (V, H, W) bool consumed mask.

    Returns (point_sum (H,W,3), normal_sum (H,W,3), count (H,W),
    emit_mask (H,W), consumed (V,H,W) source pixels to mark used).
    """
    V = num_views
    H, W = depths.shape[1:]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    d_ref = depths[ref]
    valid_ref = (d_ref > 0) & ~used[ref]
    X = geo.backproject(cams, ref, xx, yy, d_ref)        # (H, W, 3) world
    n_ref = normals[ref]

    cos_thr = math.cos(math.radians(fp.normal_thresh_deg))
    point_sum = X
    normal_sum = n_ref
    count = jnp.zeros((H, W), jnp.int32)
    consumed = []
    for j in range(V):
        if j == ref:
            consumed.append(jnp.zeros((H, W), bool))
            continue
        q, w_proj = geo.project(cams, j, X)
        d_j, inb = _nearest_lookup(depths[j], q[..., 0], q[..., 1])
        n_j, _ = _nearest_lookup(normals[j], q[..., 0], q[..., 1])
        used_j, _ = _nearest_lookup(used[j].astype(jnp.float32),
                                    q[..., 0], q[..., 1])
        ok_depth = (d_j > 0) & (jnp.abs(w_proj - d_j)
                                < fp.depth_diff * d_j)
        ok_angle = jnp.sum(n_ref * n_j, axis=-1) > cos_thr
        # Round-trip reprojection: the source pixel's own 3-D point must
        # land within reproj_error px of the reference pixel.
        qxi = jnp.round(q[..., 0])
        qyi = jnp.round(q[..., 1])
        X_j = geo.backproject(cams, j, qxi, qyi, d_j)
        p_back, _wb = geo.project(cams, ref, X_j)
        ok_reproj = ((p_back[..., 0] - xx) ** 2
                     + (p_back[..., 1] - yy) ** 2
                     < fp.reproj_error * fp.reproj_error)
        ok = (inb & ok_depth & ok_angle & ok_reproj & valid_ref
              & (used_j < 0.5))
        point_sum = point_sum + jnp.where(ok[..., None], X_j, 0.0)
        normal_sum = normal_sum + jnp.where(ok[..., None], n_j, 0.0)
        count = count + ok.astype(jnp.int32)
        consumed.append(ok)

    emit = valid_ref & (count >= fp.num_consistent)
    # Scatter consumed source pixels back to each source view's grid.
    consumed_maps = []
    for j in range(V):
        if j == ref:
            consumed_maps.append(emit)
            continue
        q, _ = geo.project(cams, j, X)
        xi = jnp.clip(jnp.round(q[..., 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(q[..., 1]).astype(jnp.int32), 0, H - 1)
        mark = consumed[j] & emit
        flat = jnp.zeros((H * W,), bool)
        flat = flat.at[yi.reshape(-1) * W + xi.reshape(-1)].max(
            mark.reshape(-1))
        consumed_maps.append(flat.reshape(H, W))
    return point_sum, normal_sum, count, emit, jnp.stack(consumed_maps)


def fusion_votes_traced(ref: jnp.ndarray, depths: jnp.ndarray,
                        normals: jnp.ndarray, cams: geo.CameraSet,
                        used: jnp.ndarray, fp: FusionParams):
    """`fusion_votes` with a *traced* reference id: one compiled program
    serves every reference view (the view-sharded fusion path used to
    lax.switch over V per-view programs — a compile-time cliff at ETH3D
    view counts). The self-view is excluded by masking the static source
    loop with `j == ref` instead of skipping it structurally.

    Same return contract as `fusion_votes`.
    """
    V, H, W = depths.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    d_ref = depths[ref]
    valid_ref = (d_ref > 0) & ~used[ref]
    X = geo.backproject(cams, ref, xx, yy, d_ref)        # (H, W, 3) world
    n_ref = normals[ref]

    cos_thr = math.cos(math.radians(fp.normal_thresh_deg))
    point_sum = X
    normal_sum = n_ref
    count = jnp.zeros((H, W), jnp.int32)
    oks = []
    for j in range(V):
        is_self = jnp.asarray(j, jnp.int32) == ref
        q, w_proj = geo.project(cams, j, X)
        d_j, inb = _nearest_lookup(depths[j], q[..., 0], q[..., 1])
        n_j, _ = _nearest_lookup(normals[j], q[..., 0], q[..., 1])
        used_j, _ = _nearest_lookup(used[j].astype(jnp.float32),
                                    q[..., 0], q[..., 1])
        ok_depth = (d_j > 0) & (jnp.abs(w_proj - d_j)
                                < fp.depth_diff * d_j)
        ok_angle = jnp.sum(n_ref * n_j, axis=-1) > cos_thr
        qxi = jnp.round(q[..., 0])
        qyi = jnp.round(q[..., 1])
        X_j = geo.backproject(cams, j, qxi, qyi, d_j)
        p_back, _wb = geo.project(cams, ref, X_j)
        ok_reproj = ((p_back[..., 0] - xx) ** 2
                     + (p_back[..., 1] - yy) ** 2
                     < fp.reproj_error * fp.reproj_error)
        ok = (inb & ok_depth & ok_angle & ok_reproj & valid_ref
              & (used_j < 0.5) & ~is_self)
        point_sum = point_sum + jnp.where(ok[..., None], X_j, 0.0)
        normal_sum = normal_sum + jnp.where(ok[..., None], n_j, 0.0)
        count = count + ok.astype(jnp.int32)
        oks.append(ok)

    emit = valid_ref & (count >= fp.num_consistent)
    consumed_maps = []
    for j in range(V):
        is_self = jnp.asarray(j, jnp.int32) == ref
        q, _ = geo.project(cams, j, X)
        xi = jnp.clip(jnp.round(q[..., 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(q[..., 1]).astype(jnp.int32), 0, H - 1)
        mark = oks[j] & emit
        flat = jnp.zeros((H * W,), bool)
        flat = flat.at[yi.reshape(-1) * W + xi.reshape(-1)].max(
            mark.reshape(-1))
        consumed_maps.append(jnp.where(is_self, emit, flat.reshape(H, W)))
    return point_sum, normal_sum, count, emit, jnp.stack(consumed_maps)


@functools.partial(jax.jit, static_argnames=("fp",))
def _fusion_votes_traced_jit(ref: jnp.ndarray, depths: jnp.ndarray,
                             normals: jnp.ndarray, cams: geo.CameraSet,
                             used: jnp.ndarray, fp: FusionParams):
    return fusion_votes_traced(ref, depths, normals, cams, used, fp)


def fuse(depths: np.ndarray, normals: np.ndarray, cams: geo.CameraSet,
         gray: np.ndarray, fp: FusionParams) -> FusedCloud:
    """Sequential fused point cloud over all reference views
    (x/*.sh driver semantics; used_list de-duplication when enabled).

    Uses the traced-reference vote program: ONE compiled program serves
    every reference view (the static-`ref` variant compiled V programs —
    measured 208 s of fusion for 8 views at 2K, nearly all compile)."""
    V, H, W = depths.shape
    depths_j = jnp.asarray(depths, jnp.float32)
    normals_j = jnp.asarray(normals, jnp.float32)
    used = jnp.zeros((V, H, W), bool)

    pts, nrms, cols, view_of = [], [], [], []
    for ref in range(V):
        ps, ns, count, emit, consumed = _fusion_votes_traced_jit(
            jnp.asarray(ref, jnp.int32), depths_j, normals_j, cams, used,
            fp)
        denom = (count + 1).astype(jnp.float32)[..., None]
        p_avg = np.asarray(ps / denom)
        n_avg = np.array(ns / denom)
        n_avg /= np.maximum(np.linalg.norm(n_avg, axis=-1, keepdims=True),
                            1e-12)
        emit_np = np.asarray(emit)
        pts.append(p_avg[emit_np])
        nrms.append(n_avg[emit_np])
        cols.append(gray[ref][emit_np].astype(np.uint8))
        view_of.append(np.full(int(emit_np.sum()), ref, np.int32))
        if fp.used_list:
            used = used | consumed

    return FusedCloud(points=np.concatenate(pts),
                      normals=np.concatenate(nrms),
                      colors=np.concatenate(cols),
                      view_of=np.concatenate(view_of))
