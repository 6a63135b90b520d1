"""Pallas TPU kernel: s-volume NCC with data-dependent slab selection.

The XLA s-volume sweep (ops/svolume.py) must visit every s plane for
every cost evaluation — its work is proportional to the volume's full
plane count S. But a tile of pixels only ever needs the few planes its
candidate field actually brackets (tens, once PatchMatch starts
converging). That skip is data-dependent, which XLA cannot express; this
kernel can: per image tile it

1. computes the tile's s-bracket [tc - reach, tc + reach] (tc = the
   window-center plane coordinate, reach = the window's slant spread)
   with an in-kernel reduction over the candidate block,
2. walks only the covered KS-plane windows of the bracket, double-
   buffering each window's halo-padded tile DMA from HBM against the
   previous window's compute,
3. reconstructs every window sample with a hat-function accumulation
   sum_k max(0, 1 - |t_o - k|) * P_k — exactly linear interpolation
   along s — into a per-(candidate, offset) sample buffer (pure VPU:
   no gathers, no lane shuffles; both measured ~0.15-0.27 G/s on v5e,
   see PERF.md),
4. finishes the bilaterally-weighted NCC from the completed samples in
   a per-candidate epilogue, exactly as ncc.pm_cost_ab.

Cost semantics match svolume.svolume_cost_ab up to accumulation-order
noise on decision-relevant pixels (oracle tolerance: median < 5e-4, q99
< 5e-3, with rare 1.0<->2.0 flips at the low-variance saturation
boundary — see tests/test_pallas_ncc.py); the candidate axis runs as a
grid dimension in blocks of
CBLK so one window DMA + one set of shifted-plane slices serves every
candidate in the block (the reference evaluates 8 propagation banks per
pixel, gipuma.cu:846-1050 — v1 of this kernel re-sliced and re-DMA'd
per candidate, an 8x redundancy).

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
KS = 16          # planes per DMA window
# Packed-tile rows: smaller tiles have narrower s-brackets (less depth
# spread per tile -> fewer planes walked) but more fixed overhead.
# Must keep TILE_H + 2*HALO_Y a multiple of 16 (bf16 sublane tiling).
TILE_H = int(os.environ.get("TSAR_PALLAS_TILE_H", 64))
if (TILE_H + 2 * HALO_Y) % 16 != 0 or TILE_H <= 0:
    raise ValueError(
        f"TSAR_PALLAS_TILE_H={TILE_H}: TILE_H + 2*HALO_Y "
        f"(= TILE_H + {2 * HALO_Y}) must be a positive multiple of 16 "
        "(bf16 sublane tiling of the slab DMA)")
TILE_W = 128     # packed-tile cols (lane width)
CBLK = 2         # candidates per grid step (shared DMA/slices)


def _cblk() -> int:
    """Candidate-block size (TSAR_PALLAS_CBLK overrides for tuning/
    bisection: 1 = per-candidate brackets and walks, v1-like)."""
    return int(os.environ.get("TSAR_PALLAS_CBLK", CBLK))


def _interpret() -> bool:
    return os.environ.get("TSAR_PALLAS_INTERPRET") == "1"


def pad_parity_volume(vol_dense: jnp.ndarray, parity: int,
                      tiles_h: int, tiles_w: int,
                      s_pad_to: int | None = None) -> jnp.ndarray:
    """Edge-pad a dense (S, H, W) volume by the window halo (in DENSE
    space, so halo samples equal dense edge clamping — see HALO_DENSE
    note) plus tile rounding, then parity-compress: output (S_pad, Hp,
    Wp) with Hp = tiles_h*TILE_H + 2*HALO_Y, Wp = tiles_w*TILE_W +
    2*HALO_X and S_pad the next multiple of KS (edge planes replicated;
    `s_pad_to` raises it further so every view shares one kernel shape).
    """
    S, H, W = vol_dense.shape
    pad_s = (-S) % KS
    if s_pad_to is not None:
        pad_s = max(pad_s, s_pad_to - S)
    pad_h = tiles_h * TILE_H - H
    pad_w = 2 * (tiles_w * TILE_W - W // 2)
    padded = jnp.pad(vol_dense,
                     ((0, pad_s),
                      (HALO_Y, HALO_Y + pad_h),
                      (2 * HALO_X, 2 * HALO_X + pad_w)), mode="edge")
    # All pads are even, so the padded origin shift preserves each
    # pixel's parity class: compress directly.
    return cb.parity_compress(padded, parity)


def _svol_ncc_kernel(offsets, cost_max: float, min_var: float,
                     cblk: int,
                     # refs (scal_ref: SMEM [S_real, parity, s_lo,
                     # inv_ds] — scalars instead of baked constants so
                     # one Mosaic kernel serves every (view, parity,
                     # s-range) at a given shape)
                     scal_ref, s0_ref, sx_ref, sy_ref, w_ref, rc_ref,
                     meanr_ref, varr_ref, invw_ref, center_ref, vol_ref,
                     out_ref,
                     # scratch
                     tbuf, xbuf, slab, sems):
    # Pixels with var_ref < min_var are forced to cost_max by the final
    # low-var override no matter what was accumulated — so they are
    # excluded from the tile's s-bracket (weak-texture pixels never
    # converge and would otherwise pin every tile's bracket to the full
    # range). Padded pixels carry var_ref = 0 and drop out the same way.
    O = len(offsets)
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    y0 = ty * TILE_H
    x0 = tx * TILE_W
    S_real = scal_ref[0].astype(jnp.int32)
    parity = scal_ref[1].astype(jnp.int32)
    s_lo = scal_ref[2]
    inv_ds = scal_ref[3]
    S1 = (S_real - 1).astype(jnp.float32)
    hrad = max(abs(i) for i, _ in offsets)
    vrad = max(abs(j) for _, j in offsets)

    # Row parity of each packed row: off(y) = (parity + y) % 2.
    rowp = ((jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
             + y0 + parity) % 2)

    textured = varr_ref[...] >= min_var

    # Per-candidate t maps (clipped plane coordinates per offset) and
    # the block's s-bracket over textured pixels. reach bounds
    # |i*sxn + j*syn| over the window, so [tc-reach, tc+reach] covers
    # every offset's t — no per-offset bracket pass needed.
    tmin = jnp.float32(S1)
    tmax = jnp.float32(0.0)
    for c in range(cblk):
        tc = (s0_ref[c] - s_lo) * inv_ds
        sxn = sx_ref[c] * inv_ds
        syn = sy_ref[c] * inv_ds
        reach = float(hrad) * jnp.abs(sxn) + float(vrad) * jnp.abs(syn)
        lo = jnp.clip(tc - reach, 0.0, S1)
        hi = jnp.clip(tc + reach, 0.0, S1)
        # Invalid candidates (border banks pad d = 0, checkerboard.
        # select_candidates) carry inf/NaN plane scalars; clip leaves
        # NaN, and one NaN pixel would otherwise poison the whole
        # block's bracket reduction — emptying the walk for every OTHER
        # candidate and pixel in the tile (their costs are masked by
        # cand_valid later, but the co-resident candidates' are not).
        okl = textured & (lo == lo)
        okh = textured & (hi == hi)
        tmin = jnp.minimum(tmin, jnp.min(jnp.where(okl, lo, S1)))
        tmax = jnp.maximum(tmax, jnp.max(jnp.where(okh, hi, 0.0)))
        for o, (i, j) in enumerate(offsets):
            tbuf[c * O + o] = jnp.clip(tc + float(i) * sxn
                                       + float(j) * syn, 0.0, S1)
            xbuf[c * O + o] = jnp.zeros((TILE_H, TILE_W), jnp.float32)

    # Hat accumulation needs k in [floor(t), floor(t)+1] for every t in
    # the bracket (floor(min(t, S-2)) + 1 at the top edge).
    k_lo = tmin.astype(jnp.int32)
    k_hi = jnp.minimum(
        tmax, jnp.maximum(S_real - 2, 0).astype(jnp.float32)
    ).astype(jnp.int32) + 1
    n_win = jnp.maximum(0, k_hi - k_lo + KS) // KS   # cdiv(k_hi-k_lo+1, KS)
    S_pad = vol_ref.shape[0]

    def start_dma(w, slot):
        base = jnp.minimum(k_lo + w * KS, S_pad - KS)
        pltpu.make_async_copy(
            vol_ref.at[pl.ds(base, KS),
                       pl.ds(y0, TILE_H + 2 * HALO_Y),
                       pl.ds(x0, TILE_W + 2 * HALO_X)],
            slab.at[slot], sems.at[slot]).start()

    @pl.when(n_win > 0)
    def _():
        start_dma(0, 0)

    def win_body(w, _):
        slot = w % 2

        @pl.when(w + 1 < n_win)
        def _():
            start_dma(w + 1, (w + 1) % 2)

        base = jnp.minimum(k_lo + w * KS, S_pad - KS)
        k_start = k_lo + w * KS   # unclamped: planes < k_start were
        pltpu.make_async_copy(     # already visited by the prior window
            vol_ref.at[pl.ds(base, KS),
                       pl.ds(y0, TILE_H + 2 * HALO_Y),
                       pl.ds(x0, TILE_W + 2 * HALO_X)],
            slab.at[slot], sems.at[slot]).wait()

        cen = center_ref[...]

        def plane_body(m, _):
            k = base + m

            @pl.when((k >= k_start) & (k <= k_hi))
            def _():
                kf = k.astype(jnp.float32)
                for o, (i, j) in enumerate(offsets):
                    dxa = (i - 1) // 2 + HALO_X
                    pa = slab[slot, m, HALO_Y + j:HALO_Y + j + TILE_H,
                              dxa:dxa + TILE_W].astype(jnp.float32)
                    pb = slab[slot, m, HALO_Y + j:HALO_Y + j + TILE_H,
                              dxa + 1:dxa + 1 + TILE_W].astype(jnp.float32)
                    # Accumulate CENTERED samples (plane - cen): raw
                    # accumulation pushes ~|I| * eps_f32 noise into every
                    # moment; the rsqrt(var) in NCC amplifies it and the
                    # engine's argmin then systematically favors the
                    # downward-noise evaluations (measured as a 3-point
                    # acc<2% loss at 672x1024 before this fix).
                    plane = jnp.where(rowp == 1, pb, pa) - cen
                    for c in range(cblk):
                        # Linear interpolation as a hat-function sum:
                        # weights (1-f, f) land at k0, k0+1 across two
                        # plane visits; X accumulates them linearly.
                        hat = jnp.maximum(
                            0.0, 1.0 - jnp.abs(tbuf[c * O + o] - kf))
                        xbuf[c * O + o] = (xbuf[c * O + o] + hat * plane)
            return 0

        jax.lax.fori_loop(0, KS, plane_body, 0)
        return 0

    jax.lax.fori_loop(0, n_win, win_body, 0)

    # Epilogue: finish NCC from the completed samples (same algebra as
    # ncc.pm_cost_ab; samples were accumulated pre-centered).
    invw = invw_ref[...]
    mean_ref_v = meanr_ref[...]
    var_ref_v = varr_ref[...]
    for c in range(cblk):
        acc_s = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc_ss = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        acc_rs = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        for o in range(O):
            xc = xbuf[c * O + o]
            w = w_ref[o].astype(jnp.float32)
            ws = w * xc
            acc_s = acc_s + ws
            acc_ss = acc_ss + ws * xc
            acc_rs = acc_rs + ws * rc_ref[o].astype(jnp.float32)
        s_c = acc_s * invw
        ss_c = acc_ss * invw
        rs_c = acc_rs * invw
        var_src = ss_c - s_c * s_c
        covar = rs_c - mean_ref_v * s_c
        ncc_cost = 1.0 - covar * jax.lax.rsqrt(
            jnp.maximum(var_ref_v * var_src, 1e-30))
        cost = jnp.clip(ncc_cost, 0.0, cost_max)
        low_var = (var_ref_v < min_var) | (var_src < min_var)
        out_ref[c] = jnp.where(low_var, cost_max, cost)


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
    cblk = min(_cblk(), C)
    n_cblk = -(-C // cblk)
    C_pad = n_cblk * cblk

    def pad_hw(a, fill=0.0):
        pads = [(0, 0)] * (a.ndim - 2) + [
            (0, tiles_h * TILE_H - Hc), (0, tiles_w * TILE_W - Wc)]
        return jnp.pad(a, pads, constant_values=fill)

    def pad_c(a):
        if C_pad == C:
            return a
        # Replicate candidate 0 (NOT zeros: a zero-plane pad would blow
        # the block's s-bracket open to the full range).
        return jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (C_pad - C,) + a.shape[1:])], 0)

    s0p, sxp, syp = (pad_c(pad_hw(s0)), pad_c(pad_hw(sx)),
                     pad_c(pad_hw(sy)))
    w_p = pad_hw(stats.weights)
    rc_p = pad_hw(stats.ref_centered)
    meanr = pad_hw(stats.mean_ref)
    varr = pad_hw(stats.var_ref)
    invw = pad_hw(stats.inv_wsum)
    cen = pad_hw(stats.center)

    kernel = functools.partial(
        _svol_ncc_kernel, tuple(offsets), float(params.cost_max),
        float(params.min_var), cblk)
    # Scalars ride in SMEM so the Mosaic kernel is shared across views,
    # parities and s-ranges (S_real <= max_planes = 1024 is exact f32).
    scal = jnp.asarray([S_real, parity, s_lo, inv_ds], jnp.float32)

    grid = (tiles_h, tiles_w, n_cblk)
    tile2 = lambda *lead: pl.BlockSpec(  # noqa: E731
        lead + (TILE_H, TILE_W),
        (lambda ty, tx, cb_, _n=len(lead): (0,) * _n + (ty, tx)),
        memory_space=pltpu.VMEM)
    ctile = pl.BlockSpec(
        (cblk, TILE_H, TILE_W),
        (lambda ty, tx, cb_: (cb_, ty, tx)),
        memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4,), (lambda ty, tx, cb_: (0,)),
                         memory_space=pltpu.SMEM),  # scalars
            ctile, ctile, ctile,                   # s0, sx, sy
            tile2(O), tile2(O),                    # weights, ref_centered
            tile2(), tile2(), tile2(), tile2(),    # meanr, varr, invw, cen
            pl.BlockSpec(memory_space=pl.ANY),     # volume (HBM)
        ],
        out_specs=ctile,
        out_shape=jax.ShapeDtypeStruct(
            (C_pad, tiles_h * TILE_H, tiles_w * TILE_W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cblk * O, TILE_H, TILE_W), jnp.float32),   # tbuf
            pltpu.VMEM((cblk * O, TILE_H, TILE_W), jnp.float32),   # xbuf
            pltpu.VMEM((2, KS, TILE_H + 2 * HALO_Y,
                        TILE_W + 2 * HALO_X), jnp.bfloat16),       # slab
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(scal, s0p, sxp, syp, w_p, rc_p, meanr, varr, invw, cen, vol_padded)

    out = out[:C, :Hc, :Wc]
    return out[0] if squeeze else out


def prepare_parity_volumes(vol_data, Hc: int, Wc: int):
    """Parity-split + halo-pad every view's dense (S, H, W) volume for
    the kernel: returns {parity: tuple over views}. The dense volumes
    are not kept — the kernel serves both parity passes, and dense
    (init) evaluations split/expand through the parity path."""
    tiles_h = -(-Hc // TILE_H)
    tiles_w = -(-(Wc // 2) // TILE_W)
    # Common plane padding: every view's volume shares one (S_pad, Hp,
    # Wp) shape, so Mosaic compiles a single kernel for all views.
    s_pad = max(v.shape[0] + (-v.shape[0]) % KS for v in vol_data)
    return {p: tuple(pad_parity_volume(v, p, tiles_h, tiles_w, s_pad)
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
