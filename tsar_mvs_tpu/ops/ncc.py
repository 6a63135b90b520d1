"""Bilaterally-weighted NCC matching cost over plane-induced homographies.

TPU-native reformulation of the reference's hot kernel (pmCost / rlCost /
pmCostMultiview_cu, gipuma.cu:229-518):

* Everything that depends only on the reference image — window intensity
  shifts, bilateral weights, the ref-side NCC moments — is hoisted out of
  the per-candidate/per-view evaluation and computed once per image with
  static-stencil shifts (no gathers).
* The plane-induced warp is evaluated in factored form
  q = A p~ - b (n·ray)/d with the window offset folded in linearly and
  exactly: ray(p + o) = ray(p) + i k0 + j k1 and A(p~ + o) = A p~ + i a0
  + j a1, so each window sample costs a handful of FMAs plus one bilinear
  gather of the source image.
* The multi-view best-n aggregation (sort_small + mean of best n,
  gipuma.cu:425-434,492-505) becomes a sort over the small static view
  axis.

Cost definition (identical to the reference): for window W(p),
bilateral weights w_o = exp(-|o|/(2 s_spatial^2) - |I(p+o)-I(p)|/
(2 s_color^2)), cost = clamp(1 - NCC_w(ref, src∘warp), 0, 2), with
cost = 2 where either windowed variance < 1e-5.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.geometry import CameraSet, matvec3, pixel_rays
from tsar_mvs_tpu.ops.sampling import (PackedImage, bilinear_sample,
                                       bilinear_sample_packed, pack_image,
                                       shift_with_edge_clamp)

MAXCOST = 2.0  # reference: config.h:22


def window_offsets(params: AlgorithmParams) -> list[tuple[int, int]]:
    """(i, j) window offsets: i in [-hrad, hrad] step win_increment
    (gipuma.cu:259-260). i is the x offset, j the y offset."""
    return [(i, j)
            for i in range(-params.hrad, params.hrad + 1, params.win_increment)
            for j in range(-params.vrad, params.vrad + 1,
                           params.win_increment)]


class RefStats(NamedTuple):
    """Per-reference-image NCC precomputation, shared by every candidate
    plane and every source view.

    Intensities are stored *centered on the window's center pixel*
    (ref_c = I(p+o) - I(p)): NCC is invariant to the shift, and centering
    removes the float32 catastrophic cancellation in E[x^2] - E[x]^2 that
    the reference's raw accumulation suffers on low-contrast windows —
    flat patches now yield exactly var = 0 and trip the min_var guard
    deterministically (gipuma.cu:286-291 semantics, better conditioned).
    """

    center: jnp.ndarray        # (H, W) I(p) — the centering constant
    ref_centered: jnp.ndarray  # (O, H, W) I(p+o) - I(p), edge-clamped
    weights: jnp.ndarray       # (O, H, W) bilateral weights
    inv_wsum: jnp.ndarray      # (H, W) 1/sum_o w_o
    mean_ref: jnp.ndarray      # (H, W) weighted mean of ref window
    var_ref: jnp.ndarray       # (H, W) weighted variance of ref window
    rays: jnp.ndarray          # (H, W, 3) K^-1 p~
    k0: jnp.ndarray            # (3,) K^-1 column 0  (d ray / dx)
    k1: jnp.ndarray            # (3,) K^-1 column 1  (d ray / dy)


def precompute_ref_stats(ref_img: jnp.ndarray, cams: CameraSet,
                         params: AlgorithmParams) -> RefStats:
    H, W = ref_img.shape
    offsets = window_offsets(params)
    inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
    inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)

    shifted = []
    weights = []
    for (i, j) in offsets:
        ref_c = shift_with_edge_clamp(ref_img, j, i) - ref_img
        spatial = math.sqrt(i * i + j * j)
        w = jnp.exp(-spatial * inv_2ss - jnp.abs(ref_c) * inv_2sc)
        shifted.append(ref_c)
        weights.append(w)
    ref_centered = jnp.stack(shifted)
    wts = jnp.stack(weights)

    wsum = jnp.sum(wts, axis=0)
    inv_wsum = 1.0 / wsum
    mean_ref = jnp.sum(wts * ref_centered, axis=0) * inv_wsum
    mean_ref_ref = jnp.sum(wts * ref_centered * ref_centered,
                           axis=0) * inv_wsum
    var_ref = mean_ref_ref - mean_ref * mean_ref

    rays = pixel_rays(cams, H, W)
    return RefStats(center=ref_img, ref_centered=ref_centered, weights=wts,
                    inv_wsum=inv_wsum,
                    mean_ref=mean_ref, var_ref=var_ref, rays=rays,
                    k0=cams.K_inv[0][:, 0], k1=cams.K_inv[0][:, 1])


def compress_stats(stats: RefStats, parity: int) -> RefStats:
    """RefStats restricted to one checkerboard parity class in the packed
    (H, W/2) layout (ops.checkerboard.parity_compress). Every per-pixel
    field is a static strided slice; k0/k1 are per-image constants."""
    from tsar_mvs_tpu.ops import checkerboard as cb
    return RefStats(
        center=cb.parity_compress(stats.center, parity),
        ref_centered=cb.parity_compress(stats.ref_centered, parity),
        weights=cb.parity_compress(stats.weights, parity),
        inv_wsum=cb.parity_compress(stats.inv_wsum, parity),
        mean_ref=cb.parity_compress(stats.mean_ref, parity),
        var_ref=cb.parity_compress(stats.var_ref, parity),
        rays=cb.parity_compress_vec(stats.rays, parity),
        k0=stats.k0, k1=stats.k1)


def pm_cost_view(src_img: jnp.ndarray, cams: CameraSet, view: int,
                 normal: jnp.ndarray, d: jnp.ndarray, stats: RefStats,
                 params: AlgorithmParams, coords=None) -> jnp.ndarray:
    """NCC cost against one statically-indexed source view."""
    return pm_cost_ab(src_img, cams.A[view], cams.b[view], normal, d,
                      stats, params, coords=coords)


def pm_cost_ab(src_img: jnp.ndarray, A: jnp.ndarray, b: jnp.ndarray,
               normal: jnp.ndarray, d: jnp.ndarray, stats: RefStats,
               params: AlgorithmParams, coords=None) -> jnp.ndarray:
    """NCC cost of plane field (normal, d) against one source view given
    its warp factors A = K_s R K_ref^-1, b = K_s t (possibly traced — the
    view-sharded batch path indexes them dynamically).

    normal: (..., Hc, Wc, 3); d: (..., Hc, Wc). Returns (..., Hc, Wc).
    `coords=(xx, yy)` gives each output position's reference-pixel
    coordinates (defaults to the dense grid); with parity-compressed
    stats (compress_stats) + packed coords the cost is evaluated only at
    that parity's pixels. `src_img` is always the full source image.
    Faithful to pmCost (gipuma.cu:229-298) with the warp factored.
    """
    offsets = window_offsets(params)

    if coords is None:
        Hc, Wc = stats.mean_ref.shape
        xx = jnp.arange(Wc, dtype=jnp.float32)[None, :]
        yy = jnp.arange(Hc, dtype=jnp.float32)[:, None]
    else:
        xx, yy = coords
    # A p~ per pixel (candidate-independent): 3 planes of (H, W).
    Ap = [A[r, 0] * xx + A[r, 1] * yy + A[r, 2] for r in range(3)]

    ndotray = jnp.sum(normal * stats.rays, axis=-1)          # (..., H, W)
    nk0 = (normal[..., 0] * stats.k0[0] + normal[..., 1] * stats.k0[1]
           + normal[..., 2] * stats.k0[2])
    nk1 = (normal[..., 0] * stats.k1[0] + normal[..., 1] * stats.k1[1]
           + normal[..., 2] * stats.k1[2])
    inv_d = 1.0 / d
    s0 = ndotray * inv_d
    sx = nk0 * inv_d
    sy = nk1 * inv_d

    if isinstance(src_img, PackedImage):
        def sample(qx, qy):
            return bilinear_sample_packed(src_img, qx, qy)
    else:
        def sample(qx, qy):
            return bilinear_sample(src_img, qx, qy)

    # The window accumulation runs as a lax.scan over the O offsets so
    # only one offset's gather result is live at a time. Unrolled, XLA's
    # scheduler materializes every (candidate-batched) gather output
    # concurrently — 36 offsets x V views of (8, H, W/2, 4) blows HBM by
    # ~30 GB at the 2K operating point.
    ij = jnp.asarray([(float(i), float(j)) for (i, j) in offsets],
                     jnp.float32)                        # (O, 2)
    # Derive the zero init from the operands (not a fresh constant) so
    # the scan carry keeps their mesh-axis "varying" type under
    # shard_map (the view-sharded path).
    zero = s0 * 0.0 + stats.center * 0.0

    def off_body(carry, xs):
        acc_src, acc_src_src, acc_ref_src = carry
        ref_c, w, ij_o = xs
        i, j = ij_o[0], ij_o[1]
        s = s0 + i * sx + j * sy
        qx = (Ap[0] + (i * A[0, 0] + j * A[0, 1])) - b[0] * s
        qy = (Ap[1] + (i * A[1, 0] + j * A[1, 1])) - b[1] * s
        qz = (Ap[2] + (i * A[2, 0] + j * A[2, 1])) - b[2] * s
        inv_qz = 1.0 / qz
        src = sample(qx * inv_qz, qy * inv_qz) - stats.center
        ws = w * src
        return (acc_src + ws, acc_src_src + ws * src,
                acc_ref_src + ws * ref_c), None

    (sum_src, sum_src_src, sum_ref_src), _ = jax.lax.scan(
        off_body, (zero, zero, zero),
        (stats.ref_centered, stats.weights, ij))

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


class MultiviewCost(NamedTuple):
    cost: jnp.ndarray       # (..., H, W) aggregated best-n mean
    best_view: jnp.ndarray  # (..., H, W) int32 view id of min cost (-1 none)
    ratio: jnp.ndarray      # (..., H, W) best/second-best cost ratio


def multiview_cost(src_imgs: jnp.ndarray, view_ids: Sequence[int],
                   cams: CameraSet, normal: jnp.ndarray, d: jnp.ndarray,
                   stats: RefStats, params: AlgorithmParams,
                   coords=None) -> MultiviewCost:
    """Aggregate per-view NCC costs (pmCostMultiview_cu, gipuma.cu:455-518).

    src_imgs: (V_total, H, W) all images (index 0 = reference);
    view_ids: static tuple of source-view indices (the view-selection
    subset). Cost = mean of the best min(n_best, #valid) per-view costs;
    a view is valid when its cost < MAXCOST.
    """
    per_view = [lambda v=v: pm_cost_view(src_imgs[v], cams, v, normal, d,
                                         stats, params, coords=coords)
                for v in view_ids]
    ids = jnp.asarray(list(view_ids), jnp.int32)
    return _aggregate_streaming(per_view, ids, params)


def multiview_cost_gathered(src_imgs: jnp.ndarray, A: jnp.ndarray,
                            b: jnp.ndarray, src_ids: jnp.ndarray,
                            src_valid: jnp.ndarray, normal: jnp.ndarray,
                            d: jnp.ndarray, stats: RefStats,
                            params: AlgorithmParams,
                            coords=None) -> MultiviewCost:
    """Multi-view cost with *traced* per-source warp factors — the
    view-sharded batch path (sources pre-gathered per reference view).

    src_imgs: (S, H, W) array or sequence of PackedImage (pre-packed by
    the caller outside any loop); A: (S, 3, 3); b: (S, 3); src_ids: (S,)
    int32 original view ids for best_view reporting; src_valid: (S,)
    bool mask for padded source slots (invalid slots cost MAXCOST).
    """
    S = len(src_imgs)

    def one(s):
        c = pm_cost_ab(src_imgs[s], A[s], b[s], normal, d, stats, params,
                       coords=coords)
        return jnp.where(src_valid[s], c, MAXCOST)

    per_view = [lambda s=s: one(s) for s in range(S)]
    return _aggregate_streaming(per_view, src_ids, params)


def multiview_cost_viewscan(packed_data: jnp.ndarray, height: int,
                            width: int, A: jnp.ndarray, b: jnp.ndarray,
                            ids: jnp.ndarray, valid: jnp.ndarray,
                            normal: jnp.ndarray, d: jnp.ndarray,
                            stats: RefStats, params: AlgorithmParams,
                            coords=None) -> MultiviewCost:
    """n_best=1 multi-view cost with the VIEW loop as a lax.scan.

    With views unrolled, XLA freely interleaves all views' offset scans
    and their working sets coexist in HBM — at the 2K x 7-source
    operating point that faults the TPU worker. Scanning the view axis
    forces one view's evaluation to be live at a time.

    packed_data: (V, H*W, 4) stacked PackedImage payloads; A: (V, 3, 3);
    b: (V, 3); ids/valid: (V,). Only supports n_best == 1 (the scripts'
    operating point).
    """
    assert params.n_best == 1
    # Operand-derived inits keep the shard_map varying type (see the
    # offset-scan note in pm_cost_ab).
    best0 = d * 0.0 + MAXCOST
    second0 = d * 0.0 + MAXCOST
    bidx0 = (d * 0.0).astype(jnp.int32)
    karr = jnp.arange(ids.shape[0], dtype=jnp.int32)

    def body(carry, xs):
        best, second, bidx = carry
        data, A_v, b_v, ok, k = xs
        img = PackedImage(data=data, height=height, width=width)
        c = pm_cost_ab(img, A_v, b_v, normal, d, stats, params,
                       coords=coords)
        c = jnp.where(ok, c, MAXCOST)
        is_new = c < best
        second = jnp.where(is_new, best, jnp.minimum(second, c))
        best = jnp.where(is_new, c, best)
        bidx = jnp.where(is_new, k, bidx)
        return (best, second, bidx), None

    (best, second, bidx), _ = jax.lax.scan(
        body, (best0, second0, bidx0), (packed_data, A, b, valid, karr))
    any_valid = best < MAXCOST
    ratio = jnp.where(any_valid, best / second, 0.0)
    best_view = jnp.where(any_valid, ids[bidx], -1)
    return MultiviewCost(cost=best, best_view=best_view, ratio=ratio)


def _aggregate_streaming(per_view, ids: jnp.ndarray,
                         params: AlgorithmParams) -> MultiviewCost:
    """Aggregate per-view costs from thunks. For n_best == 1 the top-2
    running mins stream view by view, so at most ~3 cost-sized buffers
    are live at once (a stacked (V, ...) cost tensor over a batched
    candidate axis OOMs HBM at the 2K operating point); otherwise falls
    back to the stacked sort-based path."""
    V = len(per_view)
    if params.n_best != 1:
        costs = jnp.stack([f() for f in per_view], axis=0)
        return aggregate_view_costs(costs, ids, params)

    best = per_view[0]()
    second = jnp.full_like(best, MAXCOST)
    bidx = jnp.zeros(best.shape, jnp.int32)
    for k in range(1, V):
        c = per_view[k]()
        is_new = c < best
        second = jnp.where(is_new, best, jnp.minimum(second, c))
        best = jnp.where(is_new, c, best)
        bidx = jnp.where(is_new, k, bidx)
    if V == 1:
        second = best
    any_valid = best < MAXCOST
    ratio = jnp.where(any_valid, best / second, 0.0)
    best_view = jnp.where(any_valid, ids[bidx], -1)
    return MultiviewCost(cost=best, best_view=best_view, ratio=ratio)


def aggregate_view_costs(costs: jnp.ndarray, ids: jnp.ndarray,
                         params: AlgorithmParams) -> MultiviewCost:
    """Best-n aggregation over the leading view axis (pmCostMultiview_cu,
    gipuma.cu:455-518): cost = mean of best min(n_best, #valid) view
    costs; ratio = best/second; best_view = argmin view id (-1 if none
    valid).

    n_best == 1 (the scripts' operating point) takes a running top-2
    min instead of a full sort: per-view costs are clipped to MAXCOST,
    so "mean of best 1 valid" is exactly the min, and skipping the sort
    avoids V-sized sort buffers in the hot loop's memory footprint."""
    V = costs.shape[0]
    if params.n_best == 1:
        best = costs[0]
        second = jnp.full_like(best, MAXCOST)
        bidx = jnp.zeros(best.shape, jnp.int32)
        for k in range(1, V):
            is_new = costs[k] < best
            second = jnp.where(is_new, best,
                               jnp.minimum(second, costs[k]))
            best = jnp.where(is_new, costs[k], best)
            bidx = jnp.where(is_new, k, bidx)
        if V == 1:
            second = best        # matches sorted[1] fallback below
        any_valid = best < MAXCOST
        ratio = jnp.where(any_valid, best / second, 0.0)
        best_view = jnp.where(any_valid, ids[bidx], -1)
        return MultiviewCost(cost=best, best_view=best_view, ratio=ratio)
    sorted_costs = jnp.sort(costs, axis=0)
    num_valid = jnp.sum((costs < MAXCOST).astype(jnp.int32), axis=0)
    num_best = jnp.minimum(num_valid, params.n_best)

    k = jnp.arange(V).reshape((V,) + (1,) * (costs.ndim - 1))
    take = (k < num_best[None]).astype(costs.dtype)
    best_sum = jnp.sum(sorted_costs * take, axis=0)
    cost = jnp.where(num_best > 0, best_sum / jnp.maximum(num_best, 1),
                     MAXCOST)

    second = sorted_costs[1] if V > 1 else sorted_costs[0]
    ratio = jnp.where(num_best > 0, sorted_costs[0] / second, 0.0)

    argmin = jnp.argmin(costs, axis=0)
    best_view = jnp.where(num_best > 0, ids[argmin], -1)
    return MultiviewCost(cost=cost, best_view=best_view, ratio=ratio)


def rl_cost_view(ref_img: jnp.ndarray, src_imgs: jnp.ndarray,
                 best_view: jnp.ndarray, view_ids: Sequence[int],
                 cams: CameraSet, normal: jnp.ndarray, d: jnp.ndarray,
                 params: AlgorithmParams) -> jnp.ndarray:
    """Reverse (source-to-reference) NCC cost at each pixel's best view
    (rlCost, gipuma.cu:300-392): the window is taken around the warped
    center in the *source* image and mapped back through H^-1.

    best_view: (H, W) int32 of per-pixel best view ids. Evaluates the
    reverse cost against every selected view and picks each pixel's via
    masking. Kept as the oracle for `rl_cost_fused` (which does the same
    work in one pass); V x the gathers of the fused path.
    """
    out = jnp.zeros_like(d)
    for v in view_ids:
        c_v = _rl_cost_single(ref_img, src_imgs[v], cams, v, normal, d,
                              params)
        out = jnp.where(best_view == v, c_v, out)
    return out


def rl_cost_fused(ref_img: jnp.ndarray, src_imgs: jnp.ndarray,
                  best_view: jnp.ndarray, view_ids: Sequence[int],
                  cams: CameraSet, normal: jnp.ndarray, d: jnp.ndarray,
                  params: AlgorithmParams) -> jnp.ndarray:
    """`rl_cost_view` in a single pass: the reference evaluates ONE
    reverse cost per pixel — at its best view (gipuma_getlrdiff,
    gipuma.cu:1160-1186) — so instead of evaluating every view densely
    and masking (V x the work), select each pixel's warp factors A/b on
    the VPU (a sum of one-hot products over the small static view set)
    and fetch samples from the stacked packed sources with a fused
    index base = best_view * H * W. Exactly the same values as
    `rl_cost_view` (same f32 sampling; tested in tests/test_ncc.py).
    """
    H, W = ref_img.shape
    bv = best_view

    # Per-pixel warp factors: exactly one term is live per pixel.
    A_px = [[jnp.zeros((), jnp.float32) for _ in range(3)]
            for _ in range(3)]
    b_px = [jnp.zeros((), jnp.float32) for _ in range(3)]
    for v in view_ids:
        m = (bv == v).astype(jnp.float32)
        for r in range(3):
            for c in range(3):
                A_px[r][c] = A_px[r][c] + cams.A[v, r, c] * m
            b_px[r] = b_px[r] + cams.b[v, r] * m

    # Stacked 4-corner-packed sources: one gather per bilinear sample,
    # per-pixel view selection folded into the index.
    packed = [pack_image(src_imgs[v]) for v in range(src_imgs.shape[0])]
    stack = jnp.stack([p.data for p in packed]).reshape(-1, 4)  # (V*H*W, 4)
    base = jnp.maximum(bv, 0).astype(jnp.int32) * (H * W)

    def sample_src(x, y):
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        idx = base + y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
        v4 = jnp.take(stack, idx, axis=0)
        top = v4[..., 0] + (v4[..., 1] - v4[..., 0]) * fx
        bot = v4[..., 2] + (v4[..., 3] - v4[..., 2]) * fx
        return top + (bot - top) * fy

    cost = _rl_cost_from_factors(ref_img, sample_src, A_px, b_px, cams,
                                 normal, d, params)
    return jnp.where(bv >= 0, cost, 0.0)


def rl_cost_fused_traced(ref_img: jnp.ndarray, src_imgs: jnp.ndarray,
                         best_view: jnp.ndarray, src_ids: jnp.ndarray,
                         src_valid: jnp.ndarray, A: jnp.ndarray,
                         b: jnp.ndarray, cams: CameraSet,
                         normal: jnp.ndarray, d: jnp.ndarray,
                         params: AlgorithmParams) -> jnp.ndarray:
    """`rl_cost_fused` with *traced* per-slot source images and warp
    factors — the shardable unit for the view-sharded confidence stage
    (one compiled program for every reference view of a scene/mesh).

    src_imgs: (S, H, W) source images in slot order; src_ids: (S,)
    global image ids matching `best_view`'s id space; src_valid: (S,)
    slot mask; A: (S, 3, 3), b: (S, 3) warp factors per slot."""
    H, W = ref_img.shape
    S = src_imgs.shape[0]
    bv = best_view

    # Per-pixel slot one-hot (exactly one live term where any matches).
    masks = [((bv == src_ids[s]) & src_valid[s]).astype(jnp.float32)
             for s in range(S)]
    any_live = sum(masks) > 0
    A_px = [[jnp.zeros((), jnp.float32) for _ in range(3)]
            for _ in range(3)]
    b_px = [jnp.zeros((), jnp.float32) for _ in range(3)]
    slot = jnp.zeros((H, W), jnp.float32)
    for s in range(S):
        m = masks[s]
        slot = slot + float(s) * m
        for r in range(3):
            for c in range(3):
                A_px[r][c] = A_px[r][c] + A[s, r, c] * m
            b_px[r] = b_px[r] + b[s, r] * m

    packed = [pack_image(src_imgs[s]) for s in range(S)]
    stack = jnp.stack([p.data for p in packed]).reshape(-1, 4)
    base = slot.astype(jnp.int32) * (H * W)

    def sample_src(x, y):
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        idx = base + y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
        v4 = jnp.take(stack, idx, axis=0)
        top = v4[..., 0] + (v4[..., 1] - v4[..., 0]) * fx
        bot = v4[..., 2] + (v4[..., 3] - v4[..., 2]) * fx
        return top + (bot - top) * fy

    cost = _rl_cost_from_factors(ref_img, sample_src, A_px, b_px, cams,
                                 normal, d, params)
    return jnp.where(any_live, cost, 0.0)


def _rl_cost_single(ref_img: jnp.ndarray, src_img: jnp.ndarray,
                    cams: CameraSet, view: int, normal: jnp.ndarray,
                    d: jnp.ndarray,
                    params: AlgorithmParams) -> jnp.ndarray:
    A = cams.A[view]
    b = cams.b[view]
    A_l = [[A[r, c] for c in range(3)] for r in range(3)]
    b_l = [b[r] for r in range(3)]

    def sample_src(x, y):
        return bilinear_sample(src_img, x, y)

    return _rl_cost_from_factors(ref_img, sample_src, A_l, b_l, cams,
                                 normal, d, params)


def _rl_cost_from_factors(ref_img: jnp.ndarray, sample_src, A, b,
                          cams: CameraSet, normal: jnp.ndarray,
                          d: jnp.ndarray,
                          params: AlgorithmParams) -> jnp.ndarray:
    """Reverse NCC cost given warp factors A (3x3 nested list of scalars
    or per-pixel maps), b (3-list) and a source sampler closure."""
    H, W = ref_img.shape
    offsets = window_offsets(params)
    inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
    inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)

    # Explicit per-pixel homography H = A - b (K^-T n)^T / d and its
    # inverse via adjugate (the reference inverts H in-kernel,
    # gipuma.cu:316-337).
    Kinv = cams.K_inv[0]
    # m = K^-T n  (3 components, per pixel)
    m0 = (Kinv[0, 0] * normal[..., 0] + Kinv[1, 0] * normal[..., 1]
          + Kinv[2, 0] * normal[..., 2])
    m1 = (Kinv[0, 1] * normal[..., 0] + Kinv[1, 1] * normal[..., 1]
          + Kinv[2, 1] * normal[..., 2])
    m2 = (Kinv[0, 2] * normal[..., 0] + Kinv[1, 2] * normal[..., 1]
          + Kinv[2, 2] * normal[..., 2])
    inv_d = 1.0 / d
    Hm = [[A[r][0] - b[r] * m0 * inv_d,
           A[r][1] - b[r] * m1 * inv_d,
           A[r][2] - b[r] * m2 * inv_d] for r in range(3)]

    # Adjugate / determinant inverse.
    c00 = Hm[1][1] * Hm[2][2] - Hm[1][2] * Hm[2][1]
    c01 = Hm[1][2] * Hm[2][0] - Hm[1][0] * Hm[2][2]
    c02 = Hm[1][0] * Hm[2][1] - Hm[1][1] * Hm[2][0]
    det = Hm[0][0] * c00 + Hm[0][1] * c01 + Hm[0][2] * c02
    inv_det = 1.0 / det
    Vm = [[c00 * inv_det,
           (Hm[0][2] * Hm[2][1] - Hm[0][1] * Hm[2][2]) * inv_det,
           (Hm[0][1] * Hm[1][2] - Hm[0][2] * Hm[1][1]) * inv_det],
          [c01 * inv_det,
           (Hm[0][0] * Hm[2][2] - Hm[0][2] * Hm[2][0]) * inv_det,
           (Hm[0][2] * Hm[1][0] - Hm[0][0] * Hm[1][2]) * inv_det],
          [c02 * inv_det,
           (Hm[0][1] * Hm[2][0] - Hm[0][0] * Hm[2][1]) * inv_det,
           (Hm[0][0] * Hm[1][1] - Hm[0][1] * Hm[1][0]) * inv_det]]

    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    # Warped center pt_c = H p.
    cz = Hm[2][0] * xx + Hm[2][1] * yy + Hm[2][2]
    cx_ = (Hm[0][0] * xx + Hm[0][1] * yy + Hm[0][2]) / cz
    cy_ = (Hm[1][0] * xx + Hm[1][1] * yy + Hm[1][2]) / cz
    cen_pix = sample_src(cx_, cy_)

    # Same lax.scan-over-offsets structure as pm_cost_ab: bounds live
    # gather buffers to one offset (unrolled, the scheduler materializes
    # every warped read and OOMs/crashes at 2K).
    ij_sp = jnp.asarray([(float(i), float(j), math.sqrt(i * i + j * j))
                         for (i, j) in offsets], jnp.float32)
    zero = cx_ * 0.0    # operand-derived: keeps shard_map varying type

    def off_body(carry, ij_o):
        s_r, s_rr, s_s, s_ss, s_rs, s_w = carry
        i, j, spatial = ij_o[0], ij_o[1], ij_o[2]
        plx = cx_ + i
        ply = cy_ + j
        ref_pix = sample_src(plx, ply) - cen_pix
        prz = Vm[2][0] * plx + Vm[2][1] * ply + Vm[2][2]
        prx = (Vm[0][0] * plx + Vm[0][1] * ply + Vm[0][2]) / prz
        pry = (Vm[1][0] * plx + Vm[1][1] * ply + Vm[1][2]) / prz
        src_pix = bilinear_sample(ref_img, prx, pry) - cen_pix
        w = jnp.exp(-spatial * inv_2ss - jnp.abs(ref_pix) * inv_2sc)
        return (s_r + w * ref_pix, s_rr + w * ref_pix * ref_pix,
                s_s + w * src_pix, s_ss + w * src_pix * src_pix,
                s_rs + w * ref_pix * src_pix, s_w + w), None

    (s_r, s_rr, s_s, s_ss, s_rs, wsum), _ = jax.lax.scan(
        off_body, (zero,) * 6, ij_sp)
    sums = [s_r, s_rr, s_s, s_ss, s_rs]

    inv_wsum = 1.0 / wsum
    mr, mrr, ms, mss, mrs = [s * inv_wsum for s in sums]
    var_ref = mrr - mr * mr
    var_src = mss - ms * ms
    covar = mrs - mr * ms
    cost = 1.0 - covar * jax.lax.rsqrt(jnp.maximum(var_ref * var_src, 1e-30))
    cost = jnp.clip(cost, 0.0, params.cost_max)
    low_var = (var_ref < params.min_var) | (var_src < params.min_var)
    return jnp.where(low_var, params.cost_max, cost)
