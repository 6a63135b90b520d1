"""SLIC superpixels as iterative k-means on a fixed grid.

JAX rebuild of the gSLICr engine (gSLICr_Lib/engines/, ~250 Hz CUDA SLIC):
* color conversion RGB -> CIELAB (gSLICr_seg_engine_shared.h:19-51),
* grid cluster init (init_cluster_centers_shared, :73-92),
* pixel-to-center association over the 3x3 neighboring cells
  (find_center_association_shared, :105-136) — expressed as 9 dense
  candidate maps + argmin,
* center update — gSLICr's two-stage shared-memory tree reduction
  (gSLICr_seg_engine_GPU.cu:260-357) becomes `jax.ops.segment_sum`,
* optional connectivity suppression (supress_local_lable, :183-205).

TSAR's operating point: spixel_size=20, coh_weight=5, 5 iterations,
CIELAB, no connectivity enforcement (main.cpp:609-615).

Distance (compute_slic_distance, :94-103): sqrt(dcolor^2 +
(dxy * coh_weight / spixel_size)^2) — color term unnormalized, exactly as
the reference computes it (max_color_dist is passed but unused there).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def rgb_to_cielab(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB (H, W, 3) in [0, 255] -> CIELAB, matching rgb2CIELab
    (gSLICr_seg_engine_shared.h:19-51) including its 1/255 ~ 0.0039216
    scale and reference white."""
    c = rgb * 0.0039216
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    x = r * 0.412453 + g * 0.357580 + b * 0.180423
    y = r * 0.212671 + g * 0.715160 + b * 0.072169
    z = r * 0.019334 + g * 0.119193 + b * 0.950227

    xr = x / 0.950456
    yr = y / 1.0
    zr = z / 1.088754

    eps, kappa = 0.008856, 903.3

    def f(t):
        return jnp.where(t > eps, jnp.cbrt(t), (kappa * t + 16.0) / 116.0)

    fx, fy, fz = f(xr), f(yr), f(zr)
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([L, a, bb], axis=-1)


def gray_to_feature(gray: jnp.ndarray) -> jnp.ndarray:
    """Grayscale (H, W) in [0, 255] -> 3-channel feature (replicated RGB
    through the CIELAB transform) so the same engine serves both paths."""
    return rgb_to_cielab(jnp.stack([gray] * 3, axis=-1))


class SlicResult(NamedTuple):
    labels: jnp.ndarray        # (H, W) int32 superpixel index
    centers_xy: jnp.ndarray    # (M, 2) float cluster centers (x, y)
    centers_color: jnp.ndarray  # (M, 3) mean color
    counts: jnp.ndarray        # (M,) pixels per cluster
    map_size: tuple[int, int]  # (map_h, map_w) static


def slic(feature: jnp.ndarray, spixel_size: int = 20,
         coh_weight: float = 5.0, n_iters: int = 5,
         enforce_connectivity: bool = False) -> SlicResult:
    """Segment feature image (H, W, 3) into ~(H/S)*(W/S) superpixels."""
    H, W = feature.shape[:2]
    S = spixel_size
    map_w = (W + S - 1) // S
    map_h = (H + S - 1) // S
    M = map_h * map_w

    # --- init centers (init_cluster_centers_shared) ---
    gx = jnp.arange(map_w) * S + S // 2
    gy = jnp.arange(map_h) * S + S // 2
    gx = jnp.where(gx >= W, (jnp.arange(map_w) * S + W) // 2, gx)
    gy = jnp.where(gy >= H, (jnp.arange(map_h) * S + H) // 2, gy)
    cx0, cy0 = jnp.meshgrid(gx, gy)  # (map_h, map_w)
    centers_xy = jnp.stack([cx0, cy0], axis=-1).reshape(M, 2).astype(
        jnp.float32)
    centers_color = feature[cy0.reshape(-1), cx0.reshape(-1)]

    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    cell_x = (jnp.arange(W) // S)[None, :]
    cell_y = (jnp.arange(H) // S)[:, None]
    norm_xy = coh_weight / float(S)

    def associate(cxy, ccol):
        best = jnp.full((H, W), jnp.inf)
        label = jnp.zeros((H, W), jnp.int32)
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                nx = cell_x + di
                ny = cell_y + dj
                ok = (nx >= 0) & (nx < map_w) & (ny >= 0) & (ny < map_h)
                idx = jnp.clip(ny, 0, map_h - 1) * map_w \
                    + jnp.clip(nx, 0, map_w - 1)
                idx_b = jnp.broadcast_to(idx, (H, W))
                col = ccol[idx_b]           # (H, W, 3)
                pos = cxy[idx_b]            # (H, W, 2)
                dc2 = jnp.sum((feature - col) ** 2, axis=-1)
                dxy2 = (xx - pos[..., 0]) ** 2 + (yy - pos[..., 1]) ** 2
                dist = dc2 + dxy2 * (norm_xy * norm_xy)
                dist = jnp.where(ok, dist, jnp.inf)
                take = dist < best
                best = jnp.where(take, dist, best)
                label = jnp.where(take, idx_b, label)
        return label

    def update(label):
        flat = label.reshape(-1)
        ones = jnp.ones((H * W,), jnp.float32)
        cnt = jax.ops.segment_sum(ones, flat, num_segments=M)
        sx = jax.ops.segment_sum(jnp.broadcast_to(xx, (H, W)).reshape(-1),
                                 flat, num_segments=M)
        sy = jax.ops.segment_sum(jnp.broadcast_to(yy, (H, W)).reshape(-1),
                                 flat, num_segments=M)
        scol = jax.ops.segment_sum(feature.reshape(H * W, 3), flat,
                                   num_segments=M)
        safe = jnp.maximum(cnt, 1.0)
        return (jnp.stack([sx / safe, sy / safe], axis=-1),
                scol / safe[:, None], cnt)

    label = associate(centers_xy, centers_color)
    counts = None
    for _ in range(n_iters):
        centers_xy, centers_color, counts = update(label)
        label = associate(centers_xy, centers_color)
    if counts is None:
        _, _, counts = update(label)

    if enforce_connectivity:
        label = suppress_local_label(label)
        label = suppress_local_label(label)

    return SlicResult(labels=label, centers_xy=centers_xy,
                      centers_color=centers_color, counts=counts,
                      map_size=(map_h, map_w))


def suppress_local_label(label: jnp.ndarray) -> jnp.ndarray:
    """Connectivity suppression (supress_local_lable,
    gSLICr_seg_engine_shared.h:183-205): if >=16 of the 5x5 neighbors
    disagree with the center label, adopt the last disagreeing label.
    Borders (2 px) are left untouched."""
    H, W = label.shape
    diff_count = jnp.zeros((H, W), jnp.int32)
    diff_label = jnp.full((H, W), -1, jnp.int32)
    # Match the reference's scan order: j (rows) outer, i (cols) inner;
    # the *last* differing neighbor wins.
    for dj in range(-2, 3):
        for di in range(-2, 3):
            n = jnp.roll(label, (-dj, -di), axis=(0, 1))
            differs = n != label
            diff_count = diff_count + differs.astype(jnp.int32)
            diff_label = jnp.where(differs, n, diff_label)
    out = jnp.where(diff_count >= 16, diff_label, label)
    border = jnp.zeros((H, W), bool)
    border = border.at[:2, :].set(True).at[-2:, :].set(True)
    border = border.at[:, :2].set(True).at[:, -2:].set(True)
    return jnp.where(border, label, out)


def superpixel_graph_host(labels) -> tuple[dict[int, set[int]],
                                           dict[int, int],
                                           dict[tuple[int, int], int]]:
    """Host-side superpixel adjacency/membership/border-length build —
    the A/B/C lists TSAR's authors appended to gSLICr
    (gSLICr_seg_engine.cpp:46-149). Returns (adjacency, sizes,
    shared-border lengths keyed by (min_label, max_label))."""
    import numpy as np
    lab = np.asarray(labels)
    sizes_u, counts_u = np.unique(lab, return_counts=True)
    sizes = dict(zip(sizes_u.tolist(), counts_u.tolist()))
    adjacency: dict[int, set[int]] = {int(k): set() for k in sizes_u}
    borders: dict[tuple[int, int], int] = {}
    for a, b in ((lab[:, :-1], lab[:, 1:]), (lab[:-1, :], lab[1:, :])):
        diff = a != b
        pa, pb = a[diff], b[diff]
        for x, y in zip(pa.tolist(), pb.tolist()):
            lo, hi = (x, y) if x < y else (y, x)
            adjacency[x].add(y)
            adjacency[y].add(x)
            borders[(lo, hi)] = borders.get((lo, hi), 0) + 1
    return adjacency, sizes, borders
