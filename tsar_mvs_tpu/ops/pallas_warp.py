"""Pallas TPU kernel: gather-free s-volume construction.

`svolume.build_svolume` samples one packed bilinear gather per voxel —
Sum_v S_v * H * W gathers. TPU gathers run at ~0.15 G idx/s (PERF.md
round-1 microbenchmarks), which makes the build ~9 s/view at the 2K
operating point: comparable to the whole PatchMatch loop it feeds.

The warp is COHERENT: the per-pixel DISPLACEMENT d = q(p, s) - p varies
slowly across an output cell (16 rows x 128 lanes x KB planes), even
though q itself spans the cell. The kernel:

1. evaluates q at the cell's 8 corners in scalar registers — qx and qy
   are Moebius functions of each coordinate separately, so their cell
   extrema are EXACTLY at box corners — and DMAs the bounding source
   window (dynamic scalar start, tile-aligned);
2. reconstructs every bilinear sample as a hat-weighted sum over a
   small static tap grid (D_y x D_x) of diagonally-shifted window
   blocks:

     out[r, l] = sum_{dy, dx} hat(ry - dy) * hat(rx - dx)
                              * win[syc + dy + r, sxc + dx + l]

   where (ry, rx) are the sample's displacement-relative coordinates.
   Block reads are plain scalar-start slices; everything else is VPU
   broadcast-FMA — no gathers, no per-lane dynamic indexing. Taps whose
   hat weight is zero contribute nothing, so oversized static tap
   ranges cost only arithmetic, never correctness.

Eligibility is host-side (`warp_view_plan`): tap counts come from the
displacement spread measured on a fine grid (+2 px convexity margin —
the displacement, unlike q, is not corner-exact), and the projective
denominator w = u_z - b_z*s must stay positive over the volume.
Ineligible views fall back to the XLA gather build; both paths clamp
sample coordinates to the image border, so semantics match either way.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_B = 16       # output rows per grid cell (bf16 sublane tile)
LANES = 128       # output cols per grid cell
KB = 8            # planes per grid cell
ROWS_CAP = 64     # source-window rows (static scratch)
WIN_X_CAP = 512   # source-window cols (static scratch, 128-mult)
D_CAP = 40        # max taps per axis (eligibility bound)
PAD_Y = 16        # top source padding: lets the aligned window origin
PAD_X = 128       # (and left padding) go "negative" without clamping —
                  # a clamped origin would shift the tap grid out of
                  # coverage. Padded values never receive hat weight
                  # (samples clamp to the true image box).


def _interpret() -> bool:
    return os.environ.get("TSAR_PALLAS_INTERPRET") == "1"


class WarpPlan(NamedTuple):
    ok: bool
    d_y: int       # static y tap count
    d_x: int       # static x tap count


def warp_view_plan(A: np.ndarray, b: np.ndarray, H: int, W: int,
                   s_lo: float, ds: float, S: int) -> WarpPlan:
    """Host-side eligibility + static tap counts for one source view.

    Tap counts bound the per-cell spread of the displacement
    (qx - x, qy - y) measured on a fine (8 px, 4 planes) grid, plus a
    3 px margin each side for interior convexity deviation (the
    measured corner-vs-interior dip must stay under 2.5 px) and the
    bilinear upper tap."""
    A = np.asarray(A, np.float64)
    b = np.asarray(b, np.float64)
    step = 8
    ys = np.arange(0, H + step, step, dtype=np.float64)
    xs = np.arange(0, W + step, step, dtype=np.float64)
    ys = np.minimum(ys, H - 1)
    xs = np.minimum(xs, W - 1)
    ks = np.arange(0, S + 4, 4, dtype=np.float64)
    ss = s_lo + np.minimum(ks, S - 1) * ds
    xx, yy = np.meshgrid(xs, ys)
    u = [A[r, 0] * xx + A[r, 1] * yy + A[r, 2] for r in range(3)]

    # Per-cell displacement spread: within any (ROWS_B, LANES, KB) cell.
    cy = ROWS_B // step + 1
    cx = LANES // step + 1
    dmax_y = dmin_y = None
    dmax_x = dmin_x = None

    def cell_minmax(q, win_r, win_c):
        from numpy.lib.stride_tricks import sliding_window_view as swv
        v = swv(q, (win_r, win_c), axis=(0, 1))
        return v.min(axis=(-2, -1)), v.max(axis=(-2, -1))

    wmin = np.inf
    span_y = 0.0
    span_x = 0.0
    dip = 0.0
    prev = None
    for i, s in enumerate(ss):
        w = u[2] - b[2] * s
        wmin = min(wmin, float(w.min()))
        if wmin <= 1e-6:
            return WarpPlan(False, 0, 0)
        # UNCLAMPED warp: the kernel never clamps (clamping breaks the
        # Moebius corner-exactness of the displacement); out-of-border
        # samples read the edge-padded source, which equals clamped
        # sampling as long as q stays inside the padded box (checked
        # below).
        qxa = (u[0] - b[0] * s) / w
        qya = (u[1] - b[1] * s) / w
        if (qxa.min() < -PAD_X + 3 or qxa.max() > W - 4 + PAD_X
                or qya.min() < -PAD_Y + 3 or qya.max() > H - 4 + PAD_Y):
            return WarpPlan(False, 0, 0)
        qx = qxa - xx
        qy = qya - yy
        mn_x, mx_x = cell_minmax(qx, cy, cx)
        mn_y, mx_y = cell_minmax(qy, cy, cx)
        # Interior dip below the cell-corner minimum (the kernel's tap
        # origin uses corner minima with a 2 px margin).
        for q, mn in ((qx, mn_x), (qy, mn_y)):
            c = np.minimum.reduce([q[:-cy + 1 or None, :-cx + 1 or None],
                                   q[:-cy + 1 or None, cx - 1:],
                                   q[cy - 1:, :-cx + 1 or None],
                                   q[cy - 1:, cx - 1:]])
            dip = max(dip, float((c - mn).max()))
        cur = (mn_x, mx_x, mn_y, mx_y)
        # Union the spread across a full KB-plane block: the s grid
        # steps by KB//2, so a block spans THREE consecutive samples.
        window = [cur] + ([] if prev is None else prev)
        mnx = np.minimum.reduce([t[0] for t in window])
        mxx = np.maximum.reduce([t[1] for t in window])
        mny = np.minimum.reduce([t[2] for t in window])
        mxy = np.maximum.reduce([t[3] for t in window])
        span_x = max(span_x, float((mxx - mnx).max()))
        span_y = max(span_y, float((mxy - mny).max()))
        prev = ([cur] + (prev or []))[:2]
    d_x = int(np.ceil(span_x)) + 6
    d_y = int(np.ceil(span_y)) + 6
    ok = (d_x <= D_CAP and d_y <= D_CAP and dip <= 2.5
          and d_y + ROWS_B + 8 <= ROWS_CAP
          and d_x + LANES + 128 <= WIN_X_CAP)
    return WarpPlan(ok, d_y, d_x)


def _warp_kernel(S_real: int, H: int, W: int, d_y: int, d_x: int,
                 scal_ref, src_ref, out_ref, win, sem):
    # scal_ref (SMEM f32): [A(9), b(3), s_lo, ds]
    kb = pl.program_id(0)
    yb = pl.program_id(1)
    xt = pl.program_id(2)
    y0 = yb * ROWS_B
    x0 = xt * LANES
    A = [[scal_ref[3 * r + c] for c in range(3)] for r in range(3)]
    bb = [scal_ref[9 + r] for r in range(3)]
    s_lo = scal_ref[12]
    ds = scal_ref[13]
    Hs = src_ref.shape[0]
    Ws = src_ref.shape[1]

    # Exact corner bounds of q AND of the displacement delta = q - p
    # (delta bounds carry a convexity margin; see module docstring).
    k_hi = jnp.minimum(jnp.int32(kb * KB + KB - 1), S_real - 1)
    ss_c = (s_lo + (kb * KB).astype(jnp.float32) * ds,
            s_lo + k_hi.astype(jnp.float32) * ds)
    qx_min = jnp.float32(np.inf)
    qy_min = jnp.float32(np.inf)
    dx_min = jnp.float32(np.inf)
    dy_min = jnp.float32(np.inf)
    for xc in (jnp.float32(x0), jnp.float32(x0 + LANES - 1)):
        for yc in (jnp.float32(y0), jnp.float32(y0 + ROWS_B - 1)):
            u0 = A[0][0] * xc + A[0][1] * yc + A[0][2]
            u1 = A[1][0] * xc + A[1][1] * yc + A[1][2]
            u2 = A[2][0] * xc + A[2][1] * yc + A[2][2]
            for sc in ss_c:
                w = u2 - bb[2] * sc
                inv = 1.0 / w
                qx = (u0 - bb[0] * sc) * inv     # UNCLAMPED: see plan
                qy = (u1 - bb[1] * sc) * inv
                qx_min = jnp.minimum(qx_min, qx)
                qy_min = jnp.minimum(qy_min, qy)
                dx_min = jnp.minimum(dx_min, qx - xc)
                dy_min = jnp.minimum(dy_min, qy - yc)

    # Window origin (tile-aligned DMA offsets, in the PADDED array
    # whose (PAD_Y, PAD_X) element is true pixel (0, 0)) and tap-grid
    # origins. Cx/Cy carry the -2 convexity margin. Invariants (from
    # qx_min >= x0 + dx_min and floor/alignment):
    #   col0_logical <= x0 + Cx  =>  0 <= sxc <= 127
    #   row0_logical <= y0 + Cy  =>  0 <= syc <= 7
    # and col0_logical >= -PAD_X, row0_logical >= -PAD_Y, so the padded
    # array never needs origin clamping.
    Cx = jnp.floor(dx_min).astype(jnp.int32) - 3
    Cy = jnp.floor(dy_min).astype(jnp.int32) - 3
    row0l = ((jnp.floor(qy_min).astype(jnp.int32) - 2) // 8) * 8
    col0l = ((jnp.floor(qx_min).astype(jnp.int32) - 2) // 128) * 128
    row0 = jnp.clip(row0l + PAD_Y, 0, jnp.maximum(Hs - ROWS_CAP, 0))
    col0 = jnp.clip(col0l + PAD_X, 0, jnp.maximum(Ws - WIN_X_CAP, 0))
    syc = jnp.clip(y0 + Cy - (row0 - PAD_Y), 0,
                   ROWS_CAP - ROWS_B - d_y)
    sxc = jnp.clip(x0 + Cx - (col0 - PAD_X), 0,
                   WIN_X_CAP - LANES - d_x)

    cp = pltpu.make_async_copy(
        src_ref.at[pl.ds(row0, ROWS_CAP), pl.ds(col0, WIN_X_CAP)],
        win, sem)
    cp.start()

    xxl = (jax.lax.broadcasted_iota(jnp.float32, (ROWS_B, LANES), 1)
           + jnp.float32(x0))
    yyl = (jax.lax.broadcasted_iota(jnp.float32, (ROWS_B, LANES), 0)
           + jnp.float32(y0))
    u0m = A[0][0] * xxl + A[0][1] * yyl + A[0][2]
    u1m = A[1][0] * xxl + A[1][1] * yyl + A[1][2]
    u2m = A[2][0] * xxl + A[2][1] * yyl + A[2][2]

    cp.wait()
    # Tap-relative sample coordinates (true-pixel frame: subtract the
    # padding offset back out).
    base_y = (row0 - PAD_Y + syc - y0).astype(jnp.float32)
    base_x = (col0 - PAD_X + sxc - x0).astype(jnp.float32)

    for m in range(KB):
        k = kb * KB + m

        @pl.when(k < S_real)
        def _():
            s = s_lo + k.astype(jnp.float32) * ds
            w = u2m - bb[2] * s
            inv = 1.0 / w
            qx = (u0m - bb[0] * s) * inv         # UNCLAMPED: see plan
            qy = (u1m - bb[1] * s) * inv
            ry = qy - yyl - base_y       # in [0, d_y) for covered taps
            rx = qx - xxl - base_x       # in [0, d_x)
            acc = jnp.zeros((ROWS_B, LANES), jnp.float32)
            for dy in range(d_y):
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - float(dy)))
                for dx in range(d_x):
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - float(dx)))
                    blk = win[pl.ds(syc + dy, ROWS_B),
                              pl.ds(sxc + dx, LANES)]
                    acc = acc + (hy * hx) * blk
            out_ref[m] = acc.astype(out_ref.dtype)


def build_volume_view_pallas(src_img: jnp.ndarray, A: jnp.ndarray,
                             b: jnp.ndarray, s_lo: float, ds: float,
                             S: int, plan: WarpPlan,
                             dtype=jnp.bfloat16) -> jnp.ndarray:
    """Gather-free (S, H, W) volume for one source view. Caller must
    have verified eligibility (`warp_view_plan(...).ok`)."""
    H, W = src_img.shape
    n_yb = -(-H // ROWS_B)
    n_xt = -(-W // LANES)
    n_kb = -(-S // KB)
    # Pad on every side so a window anchored at any border fits
    # WITHOUT clamping its origin (a clamped origin shifts the tap grid
    # out of coverage). Padded values never receive hat weight.
    Hs = PAD_Y + n_yb * ROWS_B + ROWS_CAP
    Ws = PAD_X + n_xt * LANES + WIN_X_CAP
    src_pad = jnp.pad(src_img,
                      ((PAD_Y, Hs - PAD_Y - H), (PAD_X, Ws - PAD_X - W)),
                      mode="edge")

    scal = jnp.concatenate([
        jnp.asarray(A, jnp.float32).reshape(9),
        jnp.asarray(b, jnp.float32).reshape(3),
        jnp.asarray([s_lo, ds], jnp.float32)])

    # Round tap counts up to multiples of 4 so nearby views share one
    # compiled kernel.
    d_y = -(-plan.d_y // 4) * 4
    d_x = -(-plan.d_x // 4) * 4
    kernel = functools.partial(_warp_kernel, S, H, W, d_y, d_x)
    out = pl.pallas_call(
        kernel,
        grid=(n_kb, n_yb, n_xt),
        in_specs=[
            pl.BlockSpec((14,), (lambda kb, yb, xt: (0,)),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # source (HBM)
        ],
        out_specs=pl.BlockSpec(
            (KB, ROWS_B, LANES),
            (lambda kb, yb, xt: (kb, yb, xt)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_kb * KB, n_yb * ROWS_B, n_xt * LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((ROWS_CAP, WIN_X_CAP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(scal, src_pad)
    return out[:S, :H, :W]
