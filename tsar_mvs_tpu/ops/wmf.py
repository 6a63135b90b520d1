"""Weighted median filters over the plane field.

Rebuild of the reference's two WMF kernels (gipuma.cu:1294-1698):

* `wmf_mark_outliers` (gipuma_WMF, :1499-1698): coarse-to-fine passes
  (radius 80/2^i, sample gap 16/2^i, i = 0..3) that compute the
  bilateral weighted median plane from reliable (scale==1) neighbors and
  mark a pixel unreliable when the median plane's disparity at the pixel
  drifts more than 24/2^i from the current plane. It only writes the
  reliability mask, not the planes.
* `wmf_fill` (gipuma_WMF_Final, :1294-1497): fine passes (radius 5*2^i,
  gap 2^i, i = 0..5) that *fill* still-unreliable textured pixels with
  the weighted median plane when at least 32/2^i reliable samples exist.

The per-pixel insertion sorts over <=121 gathered samples become a
radix bit-descent weighted median (`_weighted_median`) — pure VPU
compare/FMA/reduce work with the donor offset index recovered by an
index descent over the tied keys; the sample grid is a static stencil,
so everything is shifts + elementwise math — no gathers, no sorts.
Row-chunking bounds the (samples, rows, W) intermediate so
full-resolution images fit in memory.

Weighted-median semantics match the reference exactly: components
(nx, ny, nz) take independent weighted medians; disparity's weighted
median selects a *donor pixel* whose depth re-anchors the median plane
(gipuma.cu:1651-1667).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops.checkerboard import shift_const


def sample_offsets(radius: int, gap: int) -> list[tuple[int, int]]:
    """(dx, dy) grid: i, j in [-radius, radius] step gap
    (gipuma.cu:1541-1570 loop)."""
    rng = list(range(-radius, radius + 1, gap))
    return [(i, j) for i in rng for j in rng]


class _MedianResult(NamedTuple):
    med_nx: jnp.ndarray
    med_ny: jnp.ndarray
    med_nz: jnp.ndarray
    donor_idx: jnp.ndarray   # (H, W) int32 index into the offset table
    donor_disp: jnp.ndarray  # (H, W) disparity of the weighted-median donor
    num: jnp.ndarray         # (H, W) int32 count of valid samples


def _float_to_ordered_uint(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone bijection float32 -> uint32: a < b  <=>  map(a) < map(b)
    (the standard sign-flip trick). Lets order statistics run as integer
    bit descents instead of sorts. -0.0 canonicalizes to +0.0 so the
    ordering agrees with float comparison semantics."""
    x = jnp.where(x == 0.0, 0.0, x)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = (bits >> 31) == 1
    return jnp.where(neg, ~bits, bits | jnp.uint32(0x80000000))


def _ordered_uint_to_float(u: jnp.ndarray) -> jnp.ndarray:
    neg = (u >> 31) == 0
    bits = jnp.where(neg, ~u, u & jnp.uint32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def _weighted_median(key: jnp.ndarray, weight: jnp.ndarray,
                     payload: jnp.ndarray | None = None):
    """Weighted median along axis 0: the smallest sample key k* whose
    cumulative weight (in stably-sorted order) reaches half the total
    (the wAcc >= wSum/2 crossing, gipuma.cu:1651-1667). Invalid samples
    must carry weight 0 and key +inf. Returns (median_key,
    median_payload?).

    Implemented as a 32-step radix bit descent on the order-preserving
    uint32 image of the keys instead of `jax.lax.sort`: XLA's TPU
    multi-operand sort of a 121-deep axis ran ~4.5 s per WMF pass at
    672x1024 (PERF.md #3); the descent is pure VPU compare/FMA/reduce
    work (~milliseconds). Semantics match the sort formulation exactly
    up to float summation order (tested bit-exact on dyadic weights,
    tests/test_wmf.py).
    """
    u = _float_to_ordered_uint(key)                      # (O, ...)
    half = jnp.sum(weight, axis=0) * 0.5

    def bit_step(i, prefix):
        mid = prefix | (jnp.uint32(1) << (jnp.uint32(31) - i))
        below = jnp.sum(jnp.where(u < mid[None], weight, 0.0), axis=0)
        # If the weight strictly below `mid` misses half, the crossing
        # value has this bit set.
        return jnp.where(below < half, mid, prefix)

    # Carry seeded FROM u (u[0] & 0 == 0) rather than a fresh constant:
    # under shard_map a constant init is device-invariant while the body
    # output varies over the mesh axis, and the while_loop rejects the
    # carry-type mismatch (scan-vma). Deriving the zeros from a varying
    # operand keeps the sharded and unsharded paths on one code path.
    med_u = jax.lax.fori_loop(
        jnp.uint32(0), jnp.uint32(32), bit_step,
        u[0] & jnp.uint32(0))
    med = _ordered_uint_to_float(med_u)
    if payload is None:
        return med

    # Tie-break within equal keys by original sample index (= stable-sort
    # order): smallest index whose running weight reaches half.
    at = u == med_u[None]
    w_at = jnp.where(at, weight, 0.0)
    base = jnp.sum(jnp.where(u < med_u[None], weight, 0.0), axis=0)
    O = key.shape[0]
    oidx = jax.lax.broadcasted_iota(jnp.uint32, key.shape, 0)
    nbits = max(1, (O - 1).bit_length())

    def idx_step(i, prefix):
        mid = prefix | (jnp.uint32(1) << (jnp.uint32(nbits - 1) - i))
        below = base + jnp.sum(jnp.where(oidx < mid[None], w_at, 0.0),
                               axis=0)
        return jnp.where(below < half, mid, prefix)

    med_i = jax.lax.fori_loop(jnp.uint32(0), jnp.uint32(nbits), idx_step,
                              u[0] & jnp.uint32(0))  # varying zeros (vma)
    med_i = jnp.minimum(med_i, jnp.uint32(O - 1)).astype(jnp.int32)
    med_p = jnp.take_along_axis(payload, med_i[None], axis=0)[0]
    return med, med_p


def _gather_samples(gray: jnp.ndarray, disp: jnp.ndarray,
                    normal: jnp.ndarray, reliable: jnp.ndarray,
                    offsets, spatial_div: float, sigma_spatial: float,
                    sigma_color: float):
    """Stack shifted samples: returns (weights, disp_s, nx_s, ny_s, nz_s)
    each (O, H, W); invalid samples get weight 0."""
    inv_ss = 1.0 / (sigma_spatial * sigma_spatial)
    inv_sc = 1.0 / (sigma_color * sigma_color)
    ws, ds, nxs, nys, nzs = [], [], [], [], []
    for (dx, dy) in offsets:
        ok = shift_const(reliable.astype(jnp.float32), dy, dx, 0.0) > 0.5
        g = shift_const(gray, dy, dx, 0.0)
        spatial = math.sqrt(dx * dx + dy * dy) / spatial_div
        w = jnp.exp(-spatial * inv_ss) * jnp.exp(-jnp.abs(g - gray) * inv_sc)
        ws.append(jnp.where(ok, w, 0.0))
        ds.append(shift_const(disp, dy, dx, jnp.inf))
        nxs.append(shift_const(normal[..., 0], dy, dx, jnp.inf))
        nys.append(shift_const(normal[..., 1], dy, dx, jnp.inf))
        nzs.append(shift_const(normal[..., 2], dy, dx, jnp.inf))
    stack = lambda xs: jnp.stack(xs, axis=0)
    return (stack(ws), stack(ds), stack(nxs), stack(nys), stack(nzs))


def _median_plane(gray: jnp.ndarray, disp: jnp.ndarray, normal: jnp.ndarray,
                  reliable: jnp.ndarray, offsets, spatial_div: float,
                  sigma_spatial: float, sigma_color: float) -> _MedianResult:
    w, d_s, nx_s, ny_s, nz_s = _gather_samples(
        gray, disp, normal, reliable, offsets, spatial_div, sigma_spatial,
        sigma_color)
    valid = w > 0.0
    num = jnp.sum(valid.astype(jnp.int32), axis=0)
    # Invalid keys already +inf (weight 0 keeps them out of the median).
    key_sel = jnp.where(valid, d_s, jnp.inf)
    O = len(offsets)
    payload = jnp.broadcast_to(
        jnp.arange(O, dtype=jnp.int32)[:, None, None], key_sel.shape)
    med_d, donor = _weighted_median(key_sel, w, payload)
    med_nx = _weighted_median(jnp.where(valid, nx_s, jnp.inf), w)
    med_ny = _weighted_median(jnp.where(valid, ny_s, jnp.inf), w)
    med_nz = _weighted_median(jnp.where(valid, nz_s, jnp.inf), w)
    return _MedianResult(med_nx=med_nx, med_ny=med_ny, med_nz=med_nz,
                         donor_idx=donor, donor_disp=med_d, num=num)


def _median_plane_chunked(gray, disp, normal, reliable, offsets,
                          spatial_div, sigma_spatial, sigma_color,
                          radius: int, chunk_rows: int) -> _MedianResult:
    """Row-chunked median computation: bounds the (O, rows, W) stack."""
    H, W = gray.shape
    if H <= chunk_rows:
        return _median_plane(gray, disp, normal, reliable, offsets,
                             spatial_div, sigma_spatial, sigma_color)
    pad = radius
    n_chunks = -(-H // chunk_rows)
    H_pad = n_chunks * chunk_rows

    def pad_rows(a, fill):
        return jnp.pad(a, [(pad, pad + H_pad - H)] + [(0, 0)] * (a.ndim - 1),
                       constant_values=fill)

    g_p = pad_rows(gray, 0.0)
    d_p = pad_rows(disp, jnp.inf)
    n_p = pad_rows(normal, jnp.inf)
    r_p = pad_rows(reliable, False)

    def body(ci):
        start = ci * chunk_rows
        rows = chunk_rows + 2 * pad
        g = jax.lax.dynamic_slice_in_dim(g_p, start, rows, 0)
        dd = jax.lax.dynamic_slice_in_dim(d_p, start, rows, 0)
        nn = jax.lax.dynamic_slice_in_dim(n_p, start, rows, 0)
        rr = jax.lax.dynamic_slice_in_dim(r_p, start, rows, 0)
        res = _median_plane(g, dd, nn, rr, offsets, spatial_div,
                            sigma_spatial, sigma_color)
        return jax.tree.map(lambda a: a[pad:pad + chunk_rows], res)

    out = jax.lax.map(body, jnp.arange(n_chunks))
    return jax.tree.map(
        lambda a: a.reshape((H_pad,) + a.shape[2:])[:H], out)


def _plane_from_median(med: _MedianResult, offsets, cams: geo.CameraSet,
                       rays: jnp.ndarray):
    """Re-anchor the median plane: normalize the component-median normal
    and set d through the donor pixel's 3-D point (gipuma.cu:1651-1667)."""
    H, W = med.donor_disp.shape
    n = jnp.stack([med.med_nx, med.med_ny, med.med_nz], axis=-1)
    n = geo.normalize(n)
    off = jnp.asarray([[dx, dy] for (dx, dy) in offsets], jnp.float32)
    dx = off[:, 0][med.donor_idx]
    dy = off[:, 1][med.donor_idx]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    px = xx + dx
    py = yy + dy
    donor_depth = geo.disparity_depth(cams.f, cams.baseline, med.donor_disp)
    # ray at donor pixel (K^-1 [px, py, 1]).
    Kinv = cams.K_inv[0]
    rx = Kinv[0, 0] * px + Kinv[0, 1] * py + Kinv[0, 2]
    ry = Kinv[1, 0] * px + Kinv[1, 1] * py + Kinv[1, 2]
    rz = jnp.ones_like(rx)
    d = -donor_depth * (n[..., 0] * rx + n[..., 1] * ry + n[..., 2] * rz)
    return n, d


@functools.partial(jax.jit, static_argnames=("iteration", "params",
                                             "chunk_rows"))
def wmf_mark_outliers(gray: jnp.ndarray, normal: jnp.ndarray,
                      d: jnp.ndarray, disp: jnp.ndarray,
                      reliable: jnp.ndarray, iteration: int,
                      cams: geo.CameraSet, rays: jnp.ndarray,
                      params: AlgorithmParams,
                      chunk_rows: int = 256) -> jnp.ndarray:
    """One gipuma_WMF pass: returns the new reliability mask.

    disp: current per-pixel *disparity* (f*baseline/depth, as lines->depth
    holds after gipuma_getview). iteration selects the coarse-to-fine
    schedule: radius 80/2^i, gap 16/2^i, spatial/2^(3-i), drift threshold
    24/2^i.
    """
    po = 2 ** iteration
    radius, gap = 80 // po, 16 // po
    repo = 2 ** (3 - iteration)
    offsets = sample_offsets(radius, gap)
    med = _median_plane_chunked(gray, disp, normal, reliable, offsets,
                                float(repo), params.wmf_sigma_spatial,
                                params.wmf_sigma_color, radius, chunk_rows)
    n_med, d_med = _plane_from_median(med, offsets, cams, rays)

    H, W = gray.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth_med = geo.depth_from_plane(cams, n_med, d_med, xx, yy)
    disp_med = geo.disparity_depth(cams.f, cams.baseline, depth_med)
    depth_org = geo.depth_from_plane(cams, normal, d, xx, yy)
    disp_org = geo.disparity_depth(cams.f, cams.baseline, depth_org)

    ths = params.wmf_drift_thr / po
    keep = jnp.abs(disp_med - disp_org) <= ths
    return jnp.where(med.num > 0, keep, False)


@functools.partial(jax.jit, static_argnames=("iteration", "params",
                                             "chunk_rows"))
def wmf_fill(gray: jnp.ndarray, normal: jnp.ndarray, d: jnp.ndarray,
             disp: jnp.ndarray, reliable: jnp.ndarray,
             textured: jnp.ndarray, iteration: int, cams: geo.CameraSet,
             rays: jnp.ndarray, params: AlgorithmParams,
             chunk_rows: int = 256):
    """One gipuma_WMF_Final pass: fills unreliable *textured* pixels with
    the weighted-median plane of reliable neighbors when enough samples
    exist (>= 32/2^i). Returns (normal, d, disp, reliable) updated.

    textured: bool mask of text==1 pixels (non-weak regions).
    """
    po = 2 ** iteration
    radius, gap = 5 * po, po
    ths = 32 // po
    offsets = sample_offsets(radius, gap)
    med = _median_plane_chunked(gray, disp, normal, reliable, offsets,
                                float(po), params.wmf_sigma_spatial,
                                params.wmf_sigma_color, radius, chunk_rows)
    n_med, d_med = _plane_from_median(med, offsets, cams, rays)

    H, W = gray.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth_med = geo.depth_from_plane(cams, n_med, d_med, xx, yy)
    disp_med = geo.disparity_depth(cams.f, cams.baseline, depth_med)

    fill = textured & ~reliable & (med.num >= ths)
    # The reference validates the *disparity* against [min_disparity,
    # max_disparity] (gipuma.cu:1479-1485).
    in_range = ((disp_med > params.min_disparity)
                & (disp_med < params.max_disparity))
    new_normal = jnp.where(fill[..., None], n_med, normal)
    new_d = jnp.where(fill, d_med, d)
    new_disp = jnp.where(fill,
                         jnp.where(in_range, disp_med,
                                   params.min_disparity), disp)
    new_reliable = jnp.where(fill, in_range, reliable)
    return new_normal, new_d, new_disp, new_reliable
