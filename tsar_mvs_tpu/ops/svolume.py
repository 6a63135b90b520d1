"""Epipolar s-volume: gather-free NCC sampling for the PatchMatch hot loop.

Why this exists (the TPU-first redesign of the reference's hot kernel,
pmCost / pmCostMultiview_cu, gipuma.cu:229-518): the reference samples
source images through the GPU texture cache — tens of billions of
arbitrary bilinear fetches per view. TPU v5e has no texture unit; every
measured gather path tops out at ~0.15-0.22 G idx/s (XLA gather, Mosaic
`tpu.dynamic_gather`, DMA — see PERF.md "gather wall"), two orders of
magnitude short of the sample rate the operating point needs.

The key structure: the plane-induced warp q = (A p~ - b s) / (A p~ - b s)_z
depends on the candidate plane ONLY through the scalar s = (n·ray)/d,
and with the repo's plane parametrization s = -1/depth exactly
(geometry.plane_d_from_depth: d = -depth*(n·ray)). So all candidate
evaluations at all pixels sample one 3-D field per view:

    W_v(p, s) = src_v(q(p, s)),   s in [-1/depth_min, -1/depth_max].

Discretize s so adjacent planes move every pixel by at most `step_px`
along its epipolar line and W becomes a per-view (S, H, W) volume. Then
an NCC window sample at offset o = (i, j) is

    src(q(p + o, s_o)),  s_o = s0 + i*sx + j*sy   (exact linearity:
                         rays are affine in the pixel)
  = W(p + o, s_o)        -> a STATIC integer shift of the volume plus
                            interpolation along the small s axis.

Linear interpolation between adjacent planes is interpolation of the
source image along the epipolar line at <= step_px spacing — the same
first-order reconstruction as bilinear filtering, so cost semantics
match the direct path to interpolation order (oracle-tested).

The hot loop needs NO gathers at all: static shifts + per-pixel
predicated selects over s-planes (pure VPU). The volume build does one
bilinear gather per voxel (~S/13 of one PatchMatch iteration's direct
gathers) — or the shear-resample fast build (planned) with none.

Divergences from the direct sampler (documented, both second-order):
* samples interpolate along the epipolar line instead of 2-D bilinear
  at the exact warped point (equal-order reconstruction);
* window samples whose implied depth leaves [depth_min, depth_max]
  clamp to the range-limit plane (the direct path samples the true
  out-of-range warp; the reference rejects such candidates at the
  window center anyway via its borders check).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.geometry import CameraSet
from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops.ncc import (MAXCOST, MultiviewCost, RefStats,
                                  window_offsets)
from tsar_mvs_tpu.ops.sampling import bilinear_sample_packed, pack_image


class SVolume(NamedTuple):
    """Per-view epipolar sweep volumes.

    data: tuple of per-view (S_v, H, W) arrays — W_v(p, s_k), bf16 by
    default (8-bit source intensities are exact in bf16 below 256;
    interpolation runs f32). Plane counts are per view: a view with
    little epipolar motion needs few planes. The s interval
    [s_lo, s_hi] is shared; per-view spacing ds_v = range / (S_v - 1).
    """

    data: tuple
    s_lo: jnp.ndarray        # () f32
    inv_ds: tuple            # per-view () f32, 1/ds_v

    @property
    def num_views(self) -> int:
        return len(self.data)


def s_range_for_depths(depth_min: float, depth_max: float,
                       margin: float = 0.0) -> tuple[float, float]:
    """[s_lo, s_hi] covering every plane whose induced depth lies in
    [depth_min, depth_max]: s = -1/depth. `margin` widens the interval
    by that fraction of its width on each side so slanted windows whose
    corner depths leave the scene range still sample exactly (beyond it
    they clamp to the edge plane — the documented divergence)."""
    lo, hi = -1.0 / depth_min, -1.0 / depth_max
    m = margin * (hi - lo)
    return lo - m, hi + m


def plane_counts(A: np.ndarray, b: np.ndarray, H: int, W: int,
                 s_lo: float, s_hi: float, step_px: float = 1.0,
                 max_planes: int = 1024,
                 budget_bytes: int | None = None,
                 bytes_per_voxel: int = 2) -> list[int]:
    """Per-view plane counts so adjacent planes move any pixel by at most
    `step_px` along its epipolar line.

    |dq/ds| is monotone in s for fixed p (rational with constant
    numerator), so the max over s is at an endpoint; sample a coarse
    pixel grid (the extremum over p is near a corner for homographies).

    budget_bytes, when set, caps total volume memory by uniformly
    coarsening step_px (a documented quality knob — interpolation
    spacing grows past 1 px of epipolar motion).
    """
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    if A.ndim == 2:
        A, b = A[None], b[None]
    xs = np.linspace(0, W - 1, 9)
    ys = np.linspace(0, H - 1, 9)
    xx, yy = np.meshgrid(xs, ys)
    p = np.stack([xx, yy, np.ones_like(xx)], -1)   # (9,9,3)
    spans = []
    for v in range(A.shape[0]):
        u = np.einsum("ij,hwj->hwi", A[v], p)      # (9,9,3)
        rate = 0.0
        for s in (s_lo, s_hi):
            w = u[..., 2] - b[v, 2] * s
            # dq/ds = (-b_xy * w + u_xy * b_z) / w^2  (per component)
            dx = (-b[v, 0] * w + u[..., 0] * b[v, 2]) / (w * w)
            dy = (-b[v, 1] * w + u[..., 1] * b[v, 2]) / (w * w)
            rate = max(rate, float(np.max(np.hypot(dx, dy))))
        spans.append(rate * (s_hi - s_lo))

    def counts(step):
        return [int(min(max_planes, max(2, math.ceil(sp / step) + 1)))
                for sp in spans]

    out = counts(step_px)
    if budget_bytes is not None:
        while (sum(out) * H * W * bytes_per_voxel > budget_bytes
               and step_px < 64.0):
            step_px *= 1.5
            out = counts(step_px)
    return out


def build_svolume(src_imgs, A: jnp.ndarray, b: jnp.ndarray,
                  s_lo: float, s_hi: float, num_planes: Sequence[int],
                  dtype=jnp.bfloat16, warp_plans=None) -> SVolume:
    """Volume builder. Two samplers per view:

    * gather (v0): one packed bilinear gather per voxel — exact but
      gather-rate-bound (~0.15 G idx/s on TPU: ~9 s/view at 2K);
    * Pallas warp kernel (ops/pallas_warp.py): gather-free hat-tap
      reconstruction, used when `warp_plans[v]` is an eligible
      host-computed WarpPlan (requires CONCRETE A/b at plan time; the
      traced-warp sharded path passes None and keeps the gather build).

    src_imgs: (V, H, W) f32 source images (NOT including the reference);
    A: (V, 3, 3), b: (V, 3) warp factors of those views; num_planes: the
    static per-view plane counts (plane_counts). The gather path runs
    the planes axis as a lax.map so one plane's gathers are live at a
    time.
    """
    V, H, W = src_imgs.shape

    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]

    def one_view(img, A_v, b_v, S):
        ds = (s_hi - s_lo) / (S - 1)
        packed = pack_image(img, jnp.bfloat16)
        u = [A_v[r, 0] * xx + A_v[r, 1] * yy + A_v[r, 2] for r in range(3)]

        def one_plane(k):
            s = s_lo + k.astype(jnp.float32) * ds
            w = u[2] - b_v[2] * s
            inv_w = 1.0 / w
            qx = (u[0] - b_v[0] * s) * inv_w
            qy = (u[1] - b_v[1] * s) * inv_w
            return bilinear_sample_packed(packed, qx, qy).astype(dtype)

        return jax.lax.map(one_plane, jnp.arange(S)), jnp.float32(1.0 / ds)

    data, inv_ds = [], []
    for v in range(V):
        S_v = int(num_planes[v])
        plan = warp_plans[v] if warp_plans is not None else None
        if plan is not None and plan.ok:
            from tsar_mvs_tpu.ops import pallas_warp as pw
            ds_v = (s_hi - s_lo) / (S_v - 1)
            vol_v = pw.build_volume_view_pallas(
                src_imgs[v], A[v], b[v], float(s_lo), float(ds_v), S_v,
                plan, dtype=dtype)
            ids_v = jnp.float32(1.0 / ds_v)
        else:
            vol_v, ids_v = one_view(src_imgs[v], A[v], b[v], S_v)
        data.append(vol_v)
        inv_ds.append(ids_v)
    return SVolume(data=tuple(data), s_lo=jnp.float32(s_lo),
                   inv_ds=tuple(inv_ds))


def _shift_compress(plane: jnp.ndarray, dy: int, dx: int,
                    parity: int | None) -> jnp.ndarray:
    """Static window shift of a full-res (..., H, W) plane, optionally
    restricted to one checkerboard parity class in packed layout.

    Window offsets have i, j both odd, so i + j is even and a parity
    class only ever samples itself — the packed read is a strided slice
    of the shifted plane (no data movement)."""
    from tsar_mvs_tpu.ops.sampling import shift_with_edge_clamp
    shifted = shift_with_edge_clamp(plane, dy, dx)
    if parity is None:
        return shifted
    return cb.parity_compress(shifted, parity)


def svolume_cost_ab(vol: SVolume, view_slot: int, s0: jnp.ndarray,
                    sx: jnp.ndarray, sy: jnp.ndarray, stats: RefStats,
                    params: AlgorithmParams,
                    parity: int | None) -> jnp.ndarray:
    """Bilaterally-weighted NCC cost against one view, sampled from the
    s-volume. Mirrors ncc.pm_cost_ab's accumulation exactly; only the
    source sampler differs (volume interpolation instead of gathers).

    s0/sx/sy: (..., Hc, Wc) plane scalar and its window derivatives —
    s0 = (n·ray)/d, sx = (n·K^-1 e_x)/d, sy = (n·K^-1 e_y)/d. stats is
    already parity-compressed when parity is not None.
    """
    offsets = window_offsets(params)
    planes = vol.data[view_slot]                    # (S, H, W)
    S = planes.shape[0]
    inv_ds = vol.inv_ds[view_slot]

    # Accumulate NCC moments in one scan over s planes: at step k, an
    # offset whose bracket starts at k contributes its fully interpolated
    # sample (planes k and k+1 both in hand, so src^2 is exact). The
    # bracket (k0, frac) is recomputed per step from (s0, sx, sy) — a few
    # FMAs — instead of materializing 36 per-offset index maps.
    zero = s0 * 0.0 + stats.center * 0.0

    def step(carry, k):
        acc_s, acc_ss, acc_rs = carry
        kf = k.astype(jnp.float32)
        pk = planes[k].astype(jnp.float32)
        pk1 = planes[jnp.minimum(k + 1, S - 1)].astype(jnp.float32)
        for o, (i, j) in enumerate(offsets):
            s_o = s0 + float(i) * sx + float(j) * sy
            t = jnp.clip((s_o - vol.s_lo) * inv_ds, 0.0,
                         float(S - 1))
            k0 = jnp.floor(jnp.minimum(t, float(S - 2)))
            a = _shift_compress(pk, j, i, parity)
            b_ = _shift_compress(pk1, j, i, parity)
            src = jnp.where(k0 == kf,
                            a + (b_ - a) * (t - k0) - stats.center, 0.0)
            ws = stats.weights[o] * src
            acc_s = acc_s + ws
            acc_ss = acc_ss + ws * src
            acc_rs = acc_rs + ws * stats.ref_centered[o]
        return (acc_s, acc_ss, acc_rs), None

    (sum_src, sum_src_src, sum_ref_src), _ = jax.lax.scan(
        step, (zero, zero, zero), jnp.arange(S, dtype=jnp.int32))

    mean_src = sum_src * stats.inv_wsum
    mean_src_src = sum_src_src * stats.inv_wsum
    mean_ref_src = sum_ref_src * stats.inv_wsum
    var_src = mean_src_src - mean_src * mean_src
    covar = mean_ref_src - stats.mean_ref * mean_src

    ncc_cost = 1.0 - covar * jax.lax.rsqrt(
        jnp.maximum(stats.var_ref * var_src, 1e-30))
    cost = jnp.clip(ncc_cost, 0.0, params.cost_max)
    low_var = ((stats.var_ref < params.min_var)
               | (var_src < params.min_var))
    return jnp.where(low_var, params.cost_max, cost)


def plane_scalars(normal: jnp.ndarray, d: jnp.ndarray,
                  stats: RefStats) -> tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray]:
    """(s0, sx, sy) for a plane field: s0 = n·ray/d and the exact window
    derivatives (rays are affine in pixel coordinates)."""
    inv_d = 1.0 / d
    s0 = jnp.sum(normal * stats.rays, axis=-1) * inv_d
    sx = (normal[..., 0] * stats.k0[0] + normal[..., 1] * stats.k0[1]
          + normal[..., 2] * stats.k0[2]) * inv_d
    sy = (normal[..., 0] * stats.k1[0] + normal[..., 1] * stats.k1[1]
          + normal[..., 2] * stats.k1[2]) * inv_d
    return s0, sx, sy


def multiview_cost_svolume(vol: SVolume, ids: jnp.ndarray,
                           valid: jnp.ndarray, normal: jnp.ndarray,
                           d: jnp.ndarray, stats: RefStats,
                           params: AlgorithmParams,
                           parity: int | None = None) -> MultiviewCost:
    """n_best=1 multi-view aggregation over s-volume per-view costs
    (streaming top-2, same semantics as ncc._aggregate_streaming).

    ids: (V,) original view ids for best_view reporting; valid: (V,)
    python bools/array for padded slots.
    """
    assert params.n_best == 1, "svolume path supports n_best == 1"
    s0, sx, sy = plane_scalars(normal, d, stats)
    V = vol.num_views

    best = None
    second = None
    bidx = None
    for v in range(V):
        c = svolume_cost_ab(vol, v, s0, sx, sy, stats, params, parity)
        c = jnp.where(valid[v], c, MAXCOST)
        if best is None:
            best = c
            second = jnp.full_like(c, MAXCOST)
            bidx = jnp.zeros(c.shape, jnp.int32)
        else:
            is_new = c < best
            second = jnp.where(is_new, best, jnp.minimum(second, c))
            best = jnp.where(is_new, c, best)
            bidx = jnp.where(is_new, v, bidx)
    if V == 1:
        second = best
    any_valid = best < MAXCOST
    ratio = jnp.where(any_valid, best / second, 0.0)
    best_view = jnp.where(any_valid, ids[bidx], -1)
    return MultiviewCost(cost=best, best_view=best_view, ratio=ratio)
