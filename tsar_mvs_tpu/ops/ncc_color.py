"""Color (float4-equivalent) bilateral NCC for `-color_processing`.

The reference's color mode uploads RGBA float4 textures
(addImageToTextureFloatColor, main.cpp:1151-1185; enabled at
main.cpp:1445) and instantiates the kernels as gipuma_first<float4>
(gipuma.cu:1879-1884). Its *active* NCC cost however reads the texture
through `tex2D<float>` regardless of the template type (pmCost,
gipuma.cu:248,263) — a type-mismatched fetch from a float4 CUDA array,
which is undefined behavior, so exact numeric parity is unachievable.
This module implements the float4 design *intent* instead, documented
divergence:

* window samples are 3-channel vectors; the NCC moments accumulate over
  all (offset, channel) samples with the offset's bilateral weight (the
  natural vector extension of pmCost's scalar accumulation);
* the bilateral color distance is the L1 norm over channels — exactly
  the reference's `l1_norm(float4)` with a zero alpha channel
  (gipuma.cu:142-146, used by its color cost path at gipuma.cu:187).

With all three channels equal the costs reduce to the grayscale NCC
evaluated with sigma_color' = sigma_color/sqrt(3) (the L1 distance
triples); the oracle test checks exactly that identity.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.geometry import CameraSet, pixel_rays
from tsar_mvs_tpu.ops.ncc import MAXCOST, MultiviewCost, _aggregate_streaming
from tsar_mvs_tpu.ops.ncc import window_offsets
from tsar_mvs_tpu.ops.sampling import (PackedImage, bilinear_sample_packed,
                                       pack_image, shift_with_edge_clamp)


class ColorRefStats(NamedTuple):
    """Per-reference-image color-NCC precomputation (channel-vector
    analogue of ncc.RefStats; channels lead so each (O, c) plane slices
    contiguously)."""

    center: jnp.ndarray        # (3, H, W) I_c(p)
    ref_centered: jnp.ndarray  # (O, 3, H, W) I_c(p+o) - I_c(p)
    weights: jnp.ndarray       # (O, H, W) bilateral weights (per offset)
    inv_wsum: jnp.ndarray      # (H, W) 1/(3 sum_o w_o)
    mean_ref: jnp.ndarray      # (H, W) weighted mean over (o, c) samples
    var_ref: jnp.ndarray       # (H, W) weighted variance over (o, c)
    rays: jnp.ndarray          # (H, W, 3)
    k0: jnp.ndarray            # (3,)
    k1: jnp.ndarray            # (3,)


def precompute_ref_stats_color(ref_rgb: jnp.ndarray, cams: CameraSet,
                               params: AlgorithmParams) -> ColorRefStats:
    """ref_rgb: (3, H, W) float32."""
    _, H, W = ref_rgb.shape
    offsets = window_offsets(params)
    inv_2ss = 1.0 / (2.0 * params.sigma_spatial * params.sigma_spatial)
    inv_2sc = 1.0 / (2.0 * params.sigma_color * params.sigma_color)

    shifted, weights = [], []
    for (i, j) in offsets:
        ref_c = shift_with_edge_clamp(ref_rgb, j, i) - ref_rgb  # (3, H, W)
        spatial = math.sqrt(i * i + j * j)
        l1 = jnp.sum(jnp.abs(ref_c), axis=0)
        weights.append(jnp.exp(-spatial * inv_2ss - l1 * inv_2sc))
        shifted.append(ref_c)
    ref_centered = jnp.stack(shifted)              # (O, 3, H, W)
    wts = jnp.stack(weights)                       # (O, H, W)

    wsum = 3.0 * jnp.sum(wts, axis=0)
    inv_wsum = 1.0 / wsum
    w_oc = wts[:, None]                            # broadcast over channels
    mean_ref = jnp.sum(w_oc * ref_centered, axis=(0, 1)) * inv_wsum
    mean_ref_ref = jnp.sum(w_oc * ref_centered * ref_centered,
                           axis=(0, 1)) * inv_wsum
    var_ref = mean_ref_ref - mean_ref * mean_ref

    rays = pixel_rays(cams, H, W)
    return ColorRefStats(center=ref_rgb, ref_centered=ref_centered,
                         weights=wts, inv_wsum=inv_wsum, mean_ref=mean_ref,
                         var_ref=var_ref, rays=rays,
                         k0=cams.K_inv[0][:, 0], k1=cams.K_inv[0][:, 1])


def compress_stats_color(stats: ColorRefStats, parity: int
                         ) -> ColorRefStats:
    """Parity-packed restriction (ncc.compress_stats analogue)."""
    from tsar_mvs_tpu.ops import checkerboard as cb
    return ColorRefStats(
        center=cb.parity_compress(stats.center, parity),
        ref_centered=cb.parity_compress(stats.ref_centered, parity),
        weights=cb.parity_compress(stats.weights, parity),
        inv_wsum=cb.parity_compress(stats.inv_wsum, parity),
        mean_ref=cb.parity_compress(stats.mean_ref, parity),
        var_ref=cb.parity_compress(stats.var_ref, parity),
        rays=cb.parity_compress_vec(stats.rays, parity),
        k0=stats.k0, k1=stats.k1)


def pack_image_color(rgb: jnp.ndarray, dtype=jnp.bfloat16
                     ) -> tuple[PackedImage, ...]:
    """Per-channel 4-corner packing of a (3, H, W) image."""
    return tuple(pack_image(rgb[c], dtype) for c in range(3))


def pm_cost_ab_color(src_packed: Sequence[PackedImage], A: jnp.ndarray,
                     b: jnp.ndarray, normal: jnp.ndarray, d: jnp.ndarray,
                     stats: ColorRefStats, params: AlgorithmParams,
                     coords=None) -> jnp.ndarray:
    """Color NCC cost against one source view (3 packed channels).

    Mirrors ncc.pm_cost_ab's factored warp + offset scan; each window
    sample fetches all three channels at the same warped point.
    """
    offsets = window_offsets(params)
    if coords is None:
        Hc, Wc = stats.mean_ref.shape
        xx = jnp.arange(Wc, dtype=jnp.float32)[None, :]
        yy = jnp.arange(Hc, dtype=jnp.float32)[:, None]
    else:
        xx, yy = coords
    Ap = [A[r, 0] * xx + A[r, 1] * yy + A[r, 2] for r in range(3)]

    inv_d = 1.0 / d
    s0 = jnp.sum(normal * stats.rays, axis=-1) * inv_d
    sx = (normal[..., 0] * stats.k0[0] + normal[..., 1] * stats.k0[1]
          + normal[..., 2] * stats.k0[2]) * inv_d
    sy = (normal[..., 0] * stats.k1[0] + normal[..., 1] * stats.k1[1]
          + normal[..., 2] * stats.k1[2]) * inv_d

    ij = jnp.asarray([(float(i), float(j)) for (i, j) in offsets],
                     jnp.float32)
    zero = s0 * 0.0 + stats.mean_ref * 0.0

    def off_body(carry, xs):
        acc_src, acc_src_src, acc_ref_src = carry
        ref_c, w, ij_o = xs                       # ref_c: (3, ...)
        i, j = ij_o[0], ij_o[1]
        s = s0 + i * sx + j * sy
        qx = (Ap[0] + (i * A[0, 0] + j * A[0, 1])) - b[0] * s
        qy = (Ap[1] + (i * A[1, 0] + j * A[1, 1])) - b[1] * s
        qz = (Ap[2] + (i * A[2, 0] + j * A[2, 1])) - b[2] * s
        inv_qz = 1.0 / qz
        for c in range(3):
            src = (bilinear_sample_packed(src_packed[c], qx * inv_qz,
                                          qy * inv_qz)
                   - stats.center[c])
            ws = w * src
            acc_src = acc_src + ws
            acc_src_src = acc_src_src + ws * src
            acc_ref_src = acc_ref_src + ws * ref_c[c]
        return (acc_src, acc_src_src, acc_ref_src), None

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


def multiview_cost_color(packed_by_view: dict, view_ids: Sequence[int],
                         cams: CameraSet, normal: jnp.ndarray,
                         d: jnp.ndarray, stats: ColorRefStats,
                         params: AlgorithmParams,
                         coords=None) -> MultiviewCost:
    """Best-n aggregation over per-view color costs (pmCostMultiview_cu
    semantics). packed_by_view: {view_id: (3 PackedImages)}."""
    per_view = [lambda v=v: pm_cost_ab_color(packed_by_view[v], cams.A[v],
                                             cams.b[v], normal, d, stats,
                                             params, coords=coords)
                for v in view_ids]
    ids = jnp.asarray(list(view_ids), jnp.int32)
    return _aggregate_streaming(per_view, ids, params)


def multiview_cost_color_viewscan(packed_stack: jnp.ndarray, height: int,
                                  width: int, A: jnp.ndarray,
                                  b: jnp.ndarray, ids: jnp.ndarray,
                                  valid: jnp.ndarray, normal: jnp.ndarray,
                                  d: jnp.ndarray, stats: ColorRefStats,
                                  params: AlgorithmParams,
                                  coords=None) -> MultiviewCost:
    """n_best=1 color multi-view cost with the VIEW loop as a lax.scan
    (the ncc.multiview_cost_viewscan structure for 3 channels): with
    views unrolled all views' 3-channel packed working sets coexist in
    HBM, which is the exact shape that faults the TPU worker at the 2K
    x 7-source point in grayscale — color triples the pressure.

    packed_stack: (V, 3, H*W, 4) stacked per-channel PackedImage
    payloads; A: (V, 3, 3); b: (V, 3); ids/valid: (V,)."""
    from tsar_mvs_tpu.ops.ncc import MAXCOST
    from tsar_mvs_tpu.ops.sampling import PackedImage
    assert params.n_best == 1
    best0 = d * 0.0 + MAXCOST
    second0 = d * 0.0 + MAXCOST
    bidx0 = (d * 0.0).astype(jnp.int32)
    karr = jnp.arange(ids.shape[0], dtype=jnp.int32)

    def body(carry, xs):
        best, second, bidx = carry
        data, A_v, b_v, ok, k = xs
        chans = tuple(PackedImage(data=data[c], height=height,
                                  width=width) for c in range(3))
        c = pm_cost_ab_color(chans, A_v, b_v, normal, d, stats, params,
                             coords=coords)
        c = jnp.where(ok, c, MAXCOST)
        is_new = c < best
        second = jnp.where(is_new, best, jnp.minimum(second, c))
        best = jnp.where(is_new, c, best)
        bidx = jnp.where(is_new, k, bidx)
        return (best, second, bidx), None

    (best, second, bidx), _ = jax.lax.scan(
        body, (best0, second0, bidx0), (packed_stack, A, b, valid, karr))
    any_valid = best < MAXCOST
    ratio = jnp.where(any_valid, best / second, 0.0)
    best_view = jnp.where(any_valid, ids[bidx], -1)
    return MultiviewCost(cost=best, best_view=best_view, ratio=ratio)
