"""Pallas TPU kernel: s-volume NCC with data-dependent slab selection.

The XLA s-volume sweep (ops/svolume.py) must visit every s plane for
every cost evaluation — its work is proportional to the volume's full
plane count S. But a tile of pixels only ever needs the few planes its
candidate field actually brackets (tens, once PatchMatch starts
converging). That skip is data-dependent, which XLA cannot express; this
kernel can: per image tile it

1. computes the tile's s-bracket range (min/max over pixels, candidates
   and the window's slant reach) with an in-kernel reduction,
2. walks only the covered KS-plane chunks, DMAing each chunk's
   halo-padded tile from HBM into VMEM,
3. accumulates every window sample's interpolated value with predicated
   selects (pure VPU — no gathers, no lane shuffles: both measured
   ~0.15-0.27 G/s on v5e, see PERF.md),
4. finishes the bilaterally-weighted NCC exactly as ncc.pm_cost_ab.

Cost semantics are identical to svolume.svolume_cost_ab (oracle-tested
bit-close); the candidate axis runs inside the kernel so one tile DMA
sweep serves all 8 propagation banks.

Layout notes: everything is checkerboard-parity-packed (H, W/2). Window
offsets (i, j) have i+j even, so a parity class samples only itself; the
packed x shift is (i-1)//2 + rowparity (rows alternate), handled with a
two-slice select. The volume comes in pre-padded by the window halo
(pad_parity_volume) so all in-kernel DMA slices are in bounds.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops.ncc import RefStats, window_offsets

# Window halo need: j in [-5, 5] packed rows; packed dx = (i-1)//2 +
# rowp for i in [-5, 5] -> [-3, 4] packed cols. The stored halo is
# larger so every in-kernel DMA slice is Mosaic-aligned: slice shapes
# must be multiples of the (8, 128) tile on the last two dims and
# offsets tile-aligned — so the slab is (KS, TILE_H + 16, TILE_W + 128)
# at offsets (16k, 64ty, 128tx). The halo is built by edge-padding the
# DENSE volume (even pads, so parity classes are preserved) before
# parity compression — halo values then equal the dense-edge-clamped
# samples the XLA sweep reads (packed-space clamping would map
# "dense x<0 -> x=0" to "x=rowp", a border divergence).
HALO_Y = 8       # packed = dense rows (even, multiple of 8)
HALO_X = 64      # packed cols = 128 dense cols (multiple of 128 total)
KS = 16          # planes per DMA chunk
TILE_H = 64      # packed-tile rows
TILE_W = 128     # packed-tile cols (lane width)


def _interpret() -> bool:
    return os.environ.get("TSAR_PALLAS_INTERPRET") == "1"


def pad_parity_volume(vol_dense: jnp.ndarray, parity: int,
                      tiles_h: int, tiles_w: int) -> jnp.ndarray:
    """Edge-pad a dense (S, H, W) volume by the window halo (in DENSE
    space, so halo samples equal dense edge clamping — see HALO_DENSE
    note) plus tile rounding, then parity-compress: output (S_pad, Hp,
    Wp) with Hp = tiles_h*TILE_H + 2*HALO_Y, Wp = tiles_w*TILE_W +
    2*HALO_X and S_pad the next multiple of KS (edge planes replicated).
    """
    S, H, W = vol_dense.shape
    pad_s = (-S) % KS
    pad_h = tiles_h * TILE_H - H
    pad_w = 2 * (tiles_w * TILE_W - W // 2)
    padded = jnp.pad(vol_dense,
                     ((0, pad_s),
                      (HALO_Y, HALO_Y + pad_h),
                      (2 * HALO_X, 2 * HALO_X + pad_w)), mode="edge")
    # All pads are even, so the padded origin shift preserves each
    # pixel's parity class: compress directly.
    return cb.parity_compress(padded, parity)


def _svol_ncc_kernel(offsets, S_real: int, s_lo: float, inv_ds: float,
                     parity: int, cost_max: float, min_var: float,
                     # refs
                     s0_ref, sx_ref, sy_ref, w_ref, rc_ref, meanr_ref,
                     varr_ref, invw_ref, center_ref, vol_ref, out_ref,
                     # scratch
                     volbuf, k0buf, fbuf, acc_s, acc_ss, acc_rs, sem):
    # Pixels with var_ref < min_var are forced to cost_max by the final
    # low-var override no matter what was accumulated — so they are
    # excluded from the tile's s-bracket (weak-texture pixels never
    # converge and would otherwise pin every tile's bracket to the full
    # range). Padded pixels carry var_ref = 0 and drop out the same way.
    C = s0_ref.shape[0]
    O = len(offsets)
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    y0 = ty * TILE_H
    x0 = tx * TILE_W

    # Row parity of each packed row: off(y) = (parity + y) % 2.
    rowp = ((jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
             + y0 + parity) % 2)

    textured = varr_ref[...] >= min_var

    def one_candidate(c, _):
        s0 = s0_ref[c]
        sx = sx_ref[c]
        sy = sy_ref[c]
        # Per-offset bracket maps + tile s-range over TEXTURED pixels
        # only (see note above). An all-weak tile yields an empty chunk
        # walk (c_lo > c_hi) and the low-var override supplies cost_max.
        tmin = jnp.float32(float(S_real))
        tmax = jnp.float32(0.0)
        for o, (i, j) in enumerate(offsets):
            s_o = s0 + float(i) * sx + float(j) * sy
            t = jnp.clip((s_o - s_lo) * inv_ds, 0.0, float(S_real - 1))
            k0 = jnp.floor(jnp.minimum(t, float(S_real - 2)))
            k0buf[o] = k0
            fbuf[o] = t - k0
            tmin = jnp.minimum(
                tmin, jnp.min(jnp.where(textured, k0, float(S_real))))
            tmax = jnp.maximum(
                tmax, jnp.max(jnp.where(textured, k0, 0.0)))
        acc_s[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc_ss[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc_rs[:] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

        c_lo = (tmin.astype(jnp.int32) // KS)
        c_hi = (tmax + 1.0).astype(jnp.int32) // KS + 1

        def chunk_body(ci, _):
            k_base = ci * KS
            dma = pltpu.make_async_copy(
                vol_ref.at[pl.ds(k_base, KS),
                           pl.ds(y0, TILE_H + 2 * HALO_Y),
                           pl.ds(x0, TILE_W + 2 * HALO_X)],
                volbuf, sem)
            dma.start()
            dma.wait()
            cen = center_ref[...]

            def plane_body(m, _):
                kf = (k_base + m).astype(jnp.float32)
                for o, (i, j) in enumerate(offsets):
                    dxa = (i - 1) // 2 + HALO_X
                    pa = volbuf[m, HALO_Y + j:HALO_Y + j + TILE_H,
                                dxa:dxa + TILE_W].astype(jnp.float32)
                    pb = volbuf[m, HALO_Y + j:HALO_Y + j + TILE_H,
                                dxa + 1:dxa + 1 + TILE_W].astype(
                                    jnp.float32)
                    plane = jnp.where(rowp == 1, pb, pa)
                    k0 = k0buf[o]
                    f = fbuf[o]
                    # Selection weight: (1-f) at the bracket plane, f at
                    # the next. Accumulate CENTERED samples (plane - cen)
                    # — centering after raw accumulation cancels
                    # catastrophically in f32 (see RefStats docstring).
                    selw = jnp.where(
                        k0 == kf, 1.0 - f,
                        jnp.where(k0 == kf - 1.0, f, 0.0))
                    contrib = selw * (plane - cen)
                    w = w_ref[o].astype(jnp.float32)
                    # src^2 needs the complete sample; each sample is a
                    # sum of exactly two plane terms arriving in
                    # ascending k order, so expand the square with the
                    # running partial: += w*c*(2*partial + c).
                    partial = fbuf[O + o]
                    acc_ss[:] = (acc_ss[:]
                                 + w * contrib * (2.0 * partial + contrib))
                    fbuf[O + o] = partial + contrib
                    acc_s[:] = acc_s[:] + w * contrib
                    acc_rs[:] = (acc_rs[:]
                                 + w * contrib
                                 * rc_ref[o].astype(jnp.float32))
                return 0

            jax.lax.fori_loop(0, KS, plane_body, 0)
            return 0

        for o in range(O):
            fbuf[O + o] = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        jax.lax.fori_loop(c_lo, c_hi, chunk_body, 0)

        # Finish NCC from the centered moments (same algebra as
        # ncc.pm_cost_ab).
        invw = invw_ref[...]
        mean_ref_v = meanr_ref[...]
        s_c = acc_s[:] * invw
        ss_c = acc_ss[:] * invw
        rs_c = acc_rs[:] * invw
        var_src = ss_c - s_c * s_c
        covar = rs_c - mean_ref_v * s_c
        var_ref_v = varr_ref[...]
        ncc_cost = 1.0 - covar * jax.lax.rsqrt(
            jnp.maximum(var_ref_v * var_src, 1e-30))
        cost = jnp.clip(ncc_cost, 0.0, cost_max)
        low_var = (var_ref_v < min_var) | (var_src < min_var)
        out_ref[c] = jnp.where(low_var, cost_max, cost)
        return 0

    jax.lax.fori_loop(0, C, one_candidate, 0)


def svolume_cost_pallas(vol_padded: jnp.ndarray, S_real: int,
                        s_lo: float, inv_ds: float, s0: jnp.ndarray,
                        sx: jnp.ndarray, sy: jnp.ndarray,
                        stats: RefStats, params: AlgorithmParams,
                        parity: int) -> jnp.ndarray:
    """Cost of a candidate-batched plane field against one view's
    parity-packed, halo-padded s-volume. s0/sx/sy: (C, Hc, Wc) or
    (Hc, Wc); stats parity-compressed. Returns (C, Hc, Wc) or (Hc, Wc).
    """
    offsets = window_offsets(params)
    squeeze = s0.ndim == 2
    if squeeze:
        s0, sx, sy = s0[None], sx[None], sy[None]
    C, Hc, Wc = s0.shape
    tiles_h = -(-Hc // TILE_H)
    tiles_w = -(-Wc // TILE_W)
    O = len(offsets)

    def pad_hw(a, fill=0.0):
        pads = [(0, 0)] * (a.ndim - 2) + [
            (0, tiles_h * TILE_H - Hc), (0, tiles_w * TILE_W - Wc)]
        return jnp.pad(a, pads, constant_values=fill)

    s0p, sxp, syp = pad_hw(s0), pad_hw(sx), pad_hw(sy)
    w_p = pad_hw(stats.weights)
    rc_p = pad_hw(stats.ref_centered)
    meanr = pad_hw(stats.mean_ref)
    varr = pad_hw(stats.var_ref)
    invw = pad_hw(stats.inv_wsum)
    cen = pad_hw(stats.center)

    kernel = functools.partial(
        _svol_ncc_kernel, tuple(offsets), S_real, float(s_lo),
        float(inv_ds), parity, float(params.cost_max),
        float(params.min_var))

    grid = (tiles_h, tiles_w)
    tile2 = lambda *lead: pl.BlockSpec(  # noqa: E731
        lead + (TILE_H, TILE_W),
        (lambda ty, tx, _n=len(lead): (0,) * _n + (ty, tx)),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tile2(C), tile2(C), tile2(C),          # s0, sx, sy
            tile2(O), tile2(O),                    # weights, ref_centered
            tile2(), tile2(), tile2(), tile2(),    # meanr, varr, invw, cen
            pl.BlockSpec(memory_space=pl.ANY),     # volume (HBM)
        ],
        out_specs=tile2(C),
        out_shape=jax.ShapeDtypeStruct(
            (C, tiles_h * TILE_H, tiles_w * TILE_W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((KS, TILE_H + 2 * HALO_Y, TILE_W + 2 * HALO_X),
                       jnp.bfloat16),               # volbuf
            pltpu.VMEM((O, TILE_H, TILE_W), jnp.float32),   # k0buf
            pltpu.VMEM((2 * O, TILE_H, TILE_W), jnp.float32),  # fbuf+partial
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),      # acc_s
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),      # acc_ss
            pltpu.VMEM((TILE_H, TILE_W), jnp.float32),      # acc_rs
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(s0p, sxp, syp, w_p, rc_p, meanr, varr, invw, cen, vol_padded)

    out = out[:, :Hc, :Wc]
    return out[0] if squeeze else out


def prepare_parity_volumes(vol_data, Hc: int, Wc: int):
    """Parity-split + halo-pad every view's dense (S, H, W) volume for
    the kernel: returns {parity: tuple over views}. The dense volumes
    are not kept — the kernel serves both parity passes, and dense
    (init) evaluations split/expand through the parity path."""
    tiles_h = -(-Hc // TILE_H)
    tiles_w = -(-(Wc // 2) // TILE_W)
    return {p: tuple(pad_parity_volume(v, p, tiles_h, tiles_w)
                     for v in vol_data)
            for p in (0, 1)}


def multiview_cost_pallas(vols_p, plane_counts, s_lo: float,
                          inv_ds, ids: jnp.ndarray, valid,
                          normal: jnp.ndarray, d: jnp.ndarray,
                          stats: RefStats, params: AlgorithmParams,
                          parity: int):
    """n_best=1 streaming top-2 aggregation over per-view Pallas kernel
    costs (mirrors svolume.multiview_cost_svolume). vols_p: tuple over
    views of padded parity volumes for THIS parity; plane_counts/inv_ds:
    static per-view; valid: per-view python bools or traced scalars."""
    from tsar_mvs_tpu.ops.ncc import MAXCOST, MultiviewCost
    assert params.n_best == 1
    from tsar_mvs_tpu.ops.svolume import plane_scalars
    s0, sx, sy = plane_scalars(normal, d, stats)
    V = len(vols_p)

    best = second = bidx = None
    for v in range(V):
        c = svolume_cost_pallas(vols_p[v], int(plane_counts[v]),
                                s_lo, float(inv_ds[v]), s0, sx, sy,
                                stats, params, parity)
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
