"""Red/black checkerboard candidate selection for PatchMatch propagation.

The reference's adaptive-checkerboard sampling (ACMM-style) examines 8
candidate banks per pixel — 4 "far" banks of 11 samples spaced 2 apart
along each axis and 4 "near" V-shaped banks of 7 samples — picks the
min-stored-cost candidate per bank, and re-evaluates only those 8 planes
with the full multi-view cost (gipuma_checkerboard_spatialProp_cu,
gipuma.cu:846-1050).

TPU-native formulation: every bank's running min is computed with
static-stencil shifted arrays (out-of-bounds filled with +inf) while
carrying the candidate plane components through the same `where` chains —
dense VPU work, no gathers, no data-dependent control flow. The red/black
halves become parity masks over the full grid.

Deliberate divergences from the reference (reference bugs not replicated,
see SURVEY.md §7 "candidate-selection control flow"):
* down_far initializes its running min from the *up_far* cost
  (gipuma.cu:906) — we initialize from down_far's own first sample;
* right_far's comparison is inverted (`costMin < c[pointTemp]`,
  gipuma.cu:943), selecting the *max*-cost sample — we select the min.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

INF = jnp.float32(jnp.inf)


def shift_const(arr: jnp.ndarray, dy: int, dx: int,
                fill: float) -> jnp.ndarray:
    """out[y, x] = arr[y+dy, x+dx] where in bounds, else `fill`.
    arr: (..., H, W); pure pad+slice (static stencil)."""
    H, W = arr.shape[-2], arr.shape[-1]
    pad_top = max(0, -dy)
    pad_bot = max(0, dy)
    pad_left = max(0, -dx)
    pad_right = max(0, dx)
    pads = [(0, 0)] * (arr.ndim - 2) + [(pad_top, pad_bot),
                                        (pad_left, pad_right)]
    padded = jnp.pad(arr, pads, mode="constant", constant_values=fill)
    ys = pad_top + dy
    xs = pad_left + dx
    return padded[..., ys:ys + H, xs:xs + W]


# Bank offset tables, (dx, dy) per candidate, mirroring gipuma.cu:874-1042.
def _far_bank(axis: str, sign: int) -> list[tuple[int, int]]:
    # start at ±3, then 11 samples spaced 2: ±(3 + 2i), i = 0..10.
    out = []
    for i in range(11):
        off = sign * (3 + 2 * i)
        out.append((off, 0) if axis == "x" else (0, off))
    return out


def _near_bank(axis: str, sign: int) -> list[tuple[int, int]]:
    # near neighbor ±1 plus a 3-deep V: (∓i, ±(2+i)) for i = 0..2.
    if axis == "y":
        out = [(0, sign * 1)]
        for i in range(3):
            out.append((-i, sign * (2 + i)))
            if i > 0:
                out.append((i, sign * (2 + i)))
    else:
        out = [(sign * 1, 0)]
        for i in range(3):
            out.append((sign * (2 + i), -i))
            if i > 0:
                out.append((sign * (2 + i), i))
    return out


BANKS: tuple[tuple[tuple[int, int], ...], ...] = (
    tuple(_far_bank("y", -1)),   # up_far
    tuple(_far_bank("y", +1)),   # down_far
    tuple(_far_bank("x", -1)),   # left_far
    tuple(_far_bank("x", +1)),   # right_far
    tuple(_near_bank("y", -1)),  # up_near
    tuple(_near_bank("y", +1)),  # down_near
    tuple(_near_bank("x", -1)),  # left_near
    tuple(_near_bank("x", +1)),  # right_near
)


class Candidates(NamedTuple):
    """8 candidate planes per pixel, one from each bank."""
    normal: jnp.ndarray   # (8, H, W, 3)
    d: jnp.ndarray        # (8, H, W)
    valid: jnp.ndarray    # (8, H, W) bool — bank had an in-bounds sample


def select_candidates(normal: jnp.ndarray, d: jnp.ndarray,
                      cost: jnp.ndarray) -> Candidates:
    """Per bank, the stored-cost argmin candidate's plane.

    normal: (H, W, 3); d, cost: (H, W).
    """
    comps = [normal[..., 0], normal[..., 1], normal[..., 2], d]
    out_n = []
    out_d = []
    out_valid = []
    for bank in BANKS:
        best_c = None
        best = None
        for (dx, dy) in bank:
            c_s = shift_const(cost, dy, dx, jnp.inf)
            vals = [shift_const(v, dy, dx, 0.0) for v in comps]
            if best_c is None:
                best_c, best = c_s, vals
            else:
                take = c_s < best_c
                best_c = jnp.where(take, c_s, best_c)
                best = [jnp.where(take, v_new, v_old)
                        for v_new, v_old in zip(vals, best)]
        out_valid.append(jnp.isfinite(best_c))
        out_n.append(jnp.stack(best[:3], axis=-1))
        out_d.append(best[3])
    return Candidates(normal=jnp.stack(out_n), d=jnp.stack(out_d),
                      valid=jnp.stack(out_valid))


def parity_mask(height: int, width: int, parity: int) -> jnp.ndarray:
    """Checkerboard mask: True where (x + y) % 2 == parity. Matches the
    reference's thread-index doubling (gipuma.cu:1096-1138): 'black'
    updates parity 0, 'red' parity 1."""
    yy = jnp.arange(height)[:, None]
    xx = jnp.arange(width)[None, :]
    return ((xx + yy) % 2) == parity


# ---------------------------------------------------------------------------
# Parity half-grid compression.
#
# A checkerboard parity class {(y, x) : (x + y) % 2 == p} packs densely
# into (H, W/2): row y holds columns x = 2j + (p + y) % 2. Both directions
# are static strided slices — no gathers — so evaluating the multiview
# cost only at the updating parity's pixels halves the hot path's gathers
# and flops relative to evaluate-everywhere-and-mask (the reference's
# half-grid kernel launches, gipuma.cu:1096-1138, achieve the same 2x).
# Requires H and W even; callers fall back to the dense path otherwise.
# ---------------------------------------------------------------------------

def parity_compressible(height: int, width: int) -> bool:
    return height % 2 == 0 and width % 2 == 0


def parity_coords(height: int, width: int, parity: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(xx, yy) float32 pixel coordinates of the packed layout,
    each (H, W/2)."""
    yy = jnp.broadcast_to(
        jnp.arange(height, dtype=jnp.float32)[:, None],
        (height, width // 2))
    off = (parity + jnp.arange(height, dtype=jnp.int32)) % 2
    xx = (2 * jnp.arange(width // 2, dtype=jnp.int32)[None, :]
          + off[:, None]).astype(jnp.float32)
    return xx, yy


def parity_compress(a: jnp.ndarray, parity: int) -> jnp.ndarray:
    """(..., H, W) -> (..., H, W/2): keep only parity-class pixels."""
    H, W = a.shape[-2], a.shape[-1]
    even = a[..., 0::2, parity::2]            # rows 0,2,..: x%2 == parity
    odd = a[..., 1::2, (1 - parity)::2]       # rows 1,3,..: x%2 == 1-parity
    out = jnp.stack([even, odd], axis=-2)     # (..., H/2, 2, W/2)
    return out.reshape(*a.shape[:-2], H, W // 2)


def parity_expand(comp: jnp.ndarray, old: jnp.ndarray,
                  parity: int) -> jnp.ndarray:
    """Scatter packed values back: parity-class pixels take `comp`,
    the rest keep `old`. comp: (..., H, W/2); old: (..., H, W)."""
    H, W = old.shape[-2], old.shape[-1]
    z = jnp.zeros_like(comp)

    def interleave(a, b):                     # a -> even x, b -> odd x
        return jnp.stack([a, b], axis=-1).reshape(*a.shape[:-1], W)

    at_even_x = interleave(comp, z)
    at_odd_x = interleave(z, comp)
    ie = at_even_x if parity == 0 else at_odd_x   # even rows
    io = at_odd_x if parity == 0 else at_even_x   # odd rows
    rows = jnp.stack([ie[..., 0::2, :], io[..., 1::2, :]], axis=-2)
    full_new = rows.reshape(*old.shape)
    return jnp.where(parity_mask(H, W, parity), full_new, old)


def parity_compress_vec(a: jnp.ndarray, parity: int) -> jnp.ndarray:
    """Channel-last variant: (..., H, W, C) -> (..., H, W/2, C)."""
    moved = jnp.moveaxis(a, -1, 0)
    return jnp.moveaxis(parity_compress(moved, parity), 0, -1)


def parity_expand_vec(comp: jnp.ndarray, old: jnp.ndarray,
                      parity: int) -> jnp.ndarray:
    """Channel-last variant of parity_expand."""
    comp_m = jnp.moveaxis(comp, -1, 0)
    old_m = jnp.moveaxis(old, -1, 0)
    return jnp.moveaxis(parity_expand(comp_m, old_m, parity), 0, -1)
