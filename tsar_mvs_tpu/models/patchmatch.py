"""Checkerboard PatchMatch MVS engine.

The compute core of the framework: red/black propagation + per-pixel
random plane refinement over bilateral-NCC multi-view cost — the full
Gipuma/ACMM-style matcher the reference contains (gipuma.cu:524-1138,
driver loop at gipuma.cu:1744-1754), expressed as dense parity-masked
updates inside one jitted `lax.fori_loop`.

Randomness is a counter-based `jax.random` stream keyed by
(iteration, parity, scale) — reproducible, unlike the reference's
`curand_init(clock64(), ...)` reseeding (gipuma.cu:700, SURVEY.md §7
determinism note).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops import ncc
from tsar_mvs_tpu.ops import sampling
from tsar_mvs_tpu.ops import svolume as sv


# Pixel count above which the direct sampler scans the view axis (one
# view's working set live at a time — unrolled views fault the TPU
# worker at 2K x 7 sources). Module-level so tests can lower it to
# exercise the branch at small sizes.
VIEWSCAN_MIN_PIXELS = 1 << 20


def resolve_ncc_impl(params: AlgorithmParams,
                     height: int | None = None,
                     width: int | None = None) -> str:
    """'auto' -> the gather-free epipolar s-volume Pallas kernel on TPU
    for the scripts' n_best=1 operating point (the measured TPU gather
    rate caps the direct sampler ~40x below the VPU path, and the XLA
    sweep pays the full plane count where the kernel pays only each
    tile's bracket spread — PERF.md), the exact direct sampler on CPU
    and for n_best > 1."""
    if params.ncc_impl != "auto":
        return params.ncc_impl
    import jax
    on_tpu = jax.default_backend() not in ("cpu",)
    packable = (height is None or width is None
                or cb.parity_compressible(height, width))
    if on_tpu and params.n_best == 1:
        return "pallas" if packable else "svolume"
    return "direct"


def svolume_plane_counts(cams: geo.CameraSet, view_ids, height: int,
                         width: int,
                         params: AlgorithmParams) -> tuple[int, ...]:
    """Host-side static per-view plane counts for the s-volume path
    (requires a concrete CameraSet)."""
    import numpy as np
    idx = list(view_ids)
    s_lo, s_hi = sv.s_range_for_depths(params.depth_min, params.depth_max,
                                       params.svolume_margin)
    counts = sv.plane_counts(
        np.asarray(cams.A)[idx], np.asarray(cams.b)[idx], height, width,
        s_lo, s_hi, step_px=params.svolume_step_px,
        budget_bytes=params.svolume_budget_mb << 20)
    return tuple(counts)


def svolume_plane_counts_shared(cams_list: Sequence[geo.CameraSet],
                                view_ids_list: Sequence[Sequence[int]],
                                height: int, width: int,
                                params: AlgorithmParams
                                ) -> tuple[int, ...]:
    """Scene-shared static plane counts: the per-source-slot max over all
    reference views' counts, with the memory budget re-applied on the
    shared maxima. One count tuple => one compiled PatchMatch program for
    every view of the scene (the reference binary likewise compiles once
    and serves the whole shell loop, scripts/courtyard.sh:28-48; per-view
    static counts made view N+1 recompile what view N already paid for).
    """
    import numpy as np
    s_lo, s_hi = sv.s_range_for_depths(params.depth_min, params.depth_max,
                                       params.svolume_margin)
    As = [np.asarray(c.A)[list(v)] for c, v in zip(cams_list,
                                                   view_ids_list)]
    bs = [np.asarray(c.b)[list(v)] for c, v in zip(cams_list,
                                                   view_ids_list)]

    def shared(step):
        per_ref = np.stack([
            sv.plane_counts(A, b, height, width, s_lo, s_hi, step_px=step)
            for A, b in zip(As, bs)])
        return per_ref.max(axis=0)

    step = params.svolume_step_px
    out = shared(step)
    budget = params.svolume_budget_mb << 20
    while out.sum() * height * width * 2 > budget and step < 64.0:
        step *= 1.5
        out = shared(step)
    return tuple(int(c) for c in out)


def svolume_warp_plans(cams: geo.CameraSet, view_ids, height: int,
                       width: int, params: AlgorithmParams,
                       svol_planes: tuple[int, ...]):
    """Host-side Pallas warp-build eligibility plans per source view
    (ops/pallas_warp.warp_view_plan; needs a concrete CameraSet).
    Returns None off-TPU (the kernel path needs real hardware unless
    TSAR_PALLAS_INTERPRET=1)."""
    import os
    if (jax.default_backend() == "cpu"
            and os.environ.get("TSAR_PALLAS_INTERPRET") != "1"):
        return None
    import numpy as np
    from tsar_mvs_tpu.ops import pallas_warp as pw
    s_lo, s_hi = sv.s_range_for_depths(params.depth_min, params.depth_max,
                                       params.svolume_margin)
    plans = []
    for slot, v in enumerate(view_ids):
        S = int(svol_planes[slot])
        ds = (s_hi - s_lo) / (S - 1)
        plans.append(pw.warp_view_plan(np.asarray(cams.A)[v],
                                       np.asarray(cams.b)[v], height,
                                       width, s_lo, ds, S))
    return tuple(plans)


class PlaneState(NamedTuple):
    """Per-pixel plane hypotheses (the SoA core of LineState,
    linestate.h:10-221)."""
    normal: jnp.ndarray     # (H, W, 3) unit normal, rebased ref frame
    d: jnp.ndarray          # (H, W) plane offset (norm4.w)
    cost: jnp.ndarray       # (H, W) current aggregated matching cost
    ratio: jnp.ndarray      # (H, W) best/second-best view cost ratio
    best_view: jnp.ndarray  # (H, W) int32 id of best source view

    @property
    def shape(self):
        return self.d.shape


def depth_map(state: PlaneState, cams: geo.CameraSet) -> jnp.ndarray:
    """Per-pixel depth induced by the plane field (getDisparity_cu)."""
    H, W = state.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    return geo.depth_from_plane(cams, state.normal, state.d, xx, yy)


def refine_schedule(params: AlgorithmParams) -> list[tuple[float, float]]:
    """Static (delta_disp, delta_normal) schedule: disparity radius
    max_disparity * refine_dz0_frac (reference: /2) shrinking /10 down
    to 0.01, normal radius 1.0 shrinking /4 (planeRefinement_cu,
    gipuma.cu:634-675)."""
    out = []
    dz = params.max_disparity * params.refine_dz0_frac
    dn = params.refine_delta_n_init
    while dz >= params.refine_delta_z_min:
        out.append((dz, dn))
        dz /= params.refine_delta_z_shrink
        dn /= params.refine_delta_n_shrink
    return out


def iteration_schedule(params: AlgorithmParams,
                       n_levels: int) -> tuple[int, ...]:
    """Per-pyramid-level iteration counts (coarse to fine): the coarsest
    level runs the full `params.iterations`; lifted levels run
    `params.iterations_fine` (0 = same as iterations). See
    config.iterations_fine for the measured A/B."""
    fine = (min(params.iterations, params.iterations_fine)
            if params.iterations_fine else params.iterations)
    return (params.iterations,) + (fine,) * (n_levels - 1)


def random_init(key: jax.Array, imgs: jnp.ndarray,
                view_ids: Sequence[int], cams: geo.CameraSet,
                stats: ncc.RefStats,
                params: AlgorithmParams) -> PlaneState:
    """Random plane init (gipuma_init_cu2, gipuma.cu:678-729): disparity
    uniform in [min_disparity, max_disparity] -> depth; normal uniform on
    the view-facing hemisphere."""
    H, W = imgs.shape[1:]

    def cost_fn(n, d, parity=None):
        return ncc.multiview_cost(imgs, view_ids, cams, n, d, stats,
                                  params)

    return random_init_with(key, (H, W), cams, stats.rays, cost_fn, params)


def random_init_with(key: jax.Array, shape: tuple[int, int],
                     cams: geo.CameraSet, rays: jnp.ndarray, cost_fn,
                     params: AlgorithmParams) -> PlaneState:
    """Random plane init evaluated through `cost_fn(n, d, parity=None)` —
    the SAME cost evaluator the iteration loop uses, so the stored init
    costs are bit-consistent with loop candidate costs (a mixed f32/bf16
    init flips accept decisions from iteration 0)."""
    H, W = shape
    k_disp, k_norm = jax.random.split(key)
    disp = jax.random.uniform(k_disp, (H, W), jnp.float32,
                              params.min_disparity, params.max_disparity)
    depth = geo.disparity_depth(cams.f, cams.baseline, disp)
    # Gaussian -> normalize is uniform on the sphere (equivalent to the
    # reference's Marsaglia sampling, gipuma.cu:118-132).
    n = jax.random.normal(k_norm, (H, W, 3), jnp.float32)
    n = geo.normalize(n)
    vv = geo.view_vectors(cams, H, W)
    n = geo.hemisphere_flip(n, vv)
    d = geo.plane_d_from_depth(n, rays, depth)
    mv = cost_fn(n, d, None)
    return PlaneState(normal=n, d=d, cost=mv.cost, ratio=mv.ratio,
                      best_view=mv.best_view)


def state_from_prior(depth: jnp.ndarray, normal: jnp.ndarray,
                     cams: geo.CameraSet, stats: ncc.RefStats,
                     rotate_to_ref: bool = True,
                     init_cost: float = 1.0) -> PlaneState:
    """Lift a prior depth/normal map into plane hypotheses
    (main.cpp:1479-1490 + gipuma_get_disp, gipuma.cu:732-755): rotate
    world-frame normals into the rebased reference frame with R_orig and
    set d through the backprojected point."""
    H, W = depth.shape
    if rotate_to_ref:
        normal = geo.matvec3(cams.R_orig[0], normal)
    d = geo.plane_d_from_depth(normal, stats.rays, depth)
    shape = (H, W)
    return PlaneState(normal=normal, d=d, cost=jnp.full(shape, init_cost),
                      ratio=jnp.zeros(shape),
                      best_view=jnp.full(shape, -1, jnp.int32))


class ParityCtx(NamedTuple):
    """Per-parity packed-layout constants for the half-grid passes
    (ops.checkerboard parity compression): pixel coordinates, camera rays
    and view vectors of each parity class in (H, W/2) layout."""
    coords: tuple   # ((xx, yy) parity 0, (xx, yy) parity 1)
    rays: tuple     # (rays_c parity 0, rays_c parity 1), each (H, W/2, 3)
    vv: tuple       # view vectors, same layout


def make_parity_ctx(stats_by_parity, cams: geo.CameraSet,
                    height: int, width: int) -> ParityCtx:
    vv = geo.view_vectors(cams, height, width)
    return ParityCtx(
        coords=tuple(cb.parity_coords(height, width, p) for p in (0, 1)),
        rays=tuple(stats_by_parity[p].rays for p in (0, 1)),
        vv=tuple(cb.parity_compress_vec(vv, p) for p in (0, 1)))


def _propagation_pass(state: PlaneState, parity: int, cost_fn,
                      cams: geo.CameraSet, params: AlgorithmParams,
                      skip_mask: jnp.ndarray | None = None,
                      pctx: ParityCtx | None = None) -> PlaneState:
    """One checkerboard spatial-propagation half-pass. cost_fn(normal, d,
    parity) -> MultiviewCost evaluates the multi-view cost of a plane
    field (parity=None: dense grid; else packed (H, W/2) layout).

    With `pctx` the candidate costs are evaluated only at the updating
    parity's pixels — half the gathers/flops of evaluate-and-mask,
    mirroring the reference's half-grid kernel launches
    (gipuma.cu:1096-1138)."""
    H, W = state.shape
    cands = cb.select_candidates(state.normal, state.d, state.cost)
    if params.prop_banks < len(cb.BANKS):
        # Lifted-prior levels: near banks only (config.prop_banks_fine;
        # the near banks sit at the END of cb.BANKS).
        cands = cb.Candidates(normal=cands.normal[-params.prop_banks:],
                              d=cands.d[-params.prop_banks:],
                              valid=cands.valid[-params.prop_banks:])

    if pctx is None:
        # Dense fallback (odd dimensions): evaluate everywhere, mask.
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        cand_n, cand_d, cand_valid = cands.normal, cands.d, cands.valid
        best_cost, best_n, best_d = state.cost, state.normal, state.d
        best_ratio, best_view = state.ratio, state.best_view
    else:
        xx, yy = pctx.coords[parity]
        cand_n = cb.parity_compress_vec(cands.normal, parity)
        cand_d = cb.parity_compress(cands.d, parity)
        cand_valid = cb.parity_compress(cands.valid, parity)
        best_cost = cb.parity_compress(state.cost, parity)
        best_n = cb.parity_compress_vec(state.normal, parity)
        best_d = cb.parity_compress(state.d, parity)
        best_ratio = cb.parity_compress(state.ratio, parity)
        best_view = cb.parity_compress(state.best_view, parity)

    # One batched multiview evaluation over the 8-bank axis (the view
    # aggregation streams top-2 running mins for n_best=1, so no
    # (V, 8, H, W) stack materializes), then a running min over banks.
    parity_arg = None if pctx is None else parity
    mv = cost_fn(cand_n, cand_d, parity_arg)
    depth_at_p = geo.depth_from_plane(cams, cand_n, cand_d, xx, yy)
    in_borders = ((depth_at_p >= cams.depth_min)
                  & (depth_at_p <= cams.depth_max))
    cand_cost = jnp.where(cand_valid & in_borders, mv.cost, jnp.inf)

    for k in range(cand_d.shape[0]):
        take = cand_cost[k] < best_cost
        best_cost = jnp.where(take, cand_cost[k], best_cost)
        best_n = jnp.where(take[..., None], cand_n[k], best_n)
        best_d = jnp.where(take, cand_d[k], best_d)
        best_ratio = jnp.where(take, mv.ratio[k], best_ratio)
        best_view = jnp.where(take, mv.best_view[k], best_view)

    if pctx is None:
        upd = cb.parity_mask(H, W, parity)
        if skip_mask is not None:
            upd = upd & ~skip_mask
        return PlaneState(
            normal=jnp.where(upd[..., None], best_n, state.normal),
            d=jnp.where(upd, best_d, state.d),
            cost=jnp.where(upd, best_cost, state.cost),
            ratio=jnp.where(upd, best_ratio, state.ratio),
            best_view=jnp.where(upd, best_view, state.best_view))

    if skip_mask is not None:
        keep = cb.parity_compress(skip_mask, parity)
        best_cost = jnp.where(keep, cb.parity_compress(state.cost, parity),
                              best_cost)
        best_n = jnp.where(keep[..., None],
                           cb.parity_compress_vec(state.normal, parity),
                           best_n)
        best_d = jnp.where(keep, cb.parity_compress(state.d, parity),
                           best_d)
        best_ratio = jnp.where(keep, cb.parity_compress(state.ratio,
                                                        parity), best_ratio)
        best_view = jnp.where(keep, cb.parity_compress(state.best_view,
                                                       parity), best_view)
    return PlaneState(
        normal=cb.parity_expand_vec(best_n, state.normal, parity),
        d=cb.parity_expand(best_d, state.d, parity),
        cost=cb.parity_expand(best_cost, state.cost, parity),
        ratio=cb.parity_expand(best_ratio, state.ratio, parity),
        best_view=cb.parity_expand(best_view, state.best_view, parity))


def _refinement_pass(state: PlaneState, parity: int, key: jax.Array,
                     cost_fn, rays: jnp.ndarray, cams: geo.CameraSet,
                     params: AlgorithmParams,
                     skip_mask: jnp.ndarray | None = None,
                     pctx: ParityCtx | None = None,
                     blocked: bool = False) -> PlaneState:
    """One checkerboard plane-refinement half-pass: multi-scale random
    search in (disparity, normal) space with sequential accepts
    (planeRefinement_cu + getRndDispAndUnitVector_cu,
    gipuma.cu:568-676). With `pctx`, the search runs entirely in the
    packed (H, W/2) parity layout (half the cost evaluations and random
    draws) and expands once at the end."""
    H, W = state.shape
    f, b = cams.f, cams.baseline

    if pctx is None:
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        yy = jnp.arange(H, dtype=jnp.float32)[:, None]
        vv = geo.view_vectors(cams, H, W)
        upd = cb.parity_mask(H, W, parity)
        if skip_mask is not None:
            upd = upd & ~skip_mask
        cur_n, cur_d = state.normal, state.d
        cur_cost, cur_ratio = state.cost, state.ratio
        cur_view = state.best_view
        shape = (H, W)
    else:
        xx, yy = pctx.coords[parity]
        vv = pctx.vv[parity]
        rays = pctx.rays[parity]
        upd = None
        if skip_mask is not None:
            upd = ~cb.parity_compress(skip_mask, parity)
        cur_n = cb.parity_compress_vec(state.normal, parity)
        cur_d = cb.parity_compress(state.d, parity)
        cur_cost = cb.parity_compress(state.cost, parity)
        cur_ratio = cb.parity_compress(state.ratio, parity)
        cur_view = cb.parity_compress(state.best_view, parity)
        shape = (H, W // 2)

    # The perturbation scales run as a lax.scan (sequential accepts are a
    # true carry dependency): one compiled body instead of ~5 unrolled
    # multiview cost evaluations — the dominant contributor to XLA
    # compile time at the full operating point.
    sched = refine_schedule(params)
    if not sched:
        return state
    deltas = jnp.asarray(sched, jnp.float32)             # (S, 2)
    keys = jax.random.split(key, len(sched))             # (S, 2)

    def scale_body(carry, xs):
        cur_n, cur_d, cur_cost, cur_ratio, cur_view = carry
        delta, k = xs
        delta_z, delta_n = delta[0], delta[1]
        k_z, k_n = jax.random.split(k)
        # Current depth at p -> disparity domain.
        depth_now = geo.depth_from_plane(cams, cur_n, cur_d, xx, yy)
        disp_now = geo.disparity_depth(f, b, depth_now)
        min_delta = -jnp.minimum(delta_z, params.min_disparity + disp_now)
        max_delta = jnp.minimum(delta_z, params.max_disparity - disp_now)
        u = jax.random.uniform(k_z, shape, jnp.float32)
        if blocked:
            # Tile-blocked coarse scales (config.refine_block_frac):
            # u = fold(u_tile + u_pixel*jfrac/2) with fold(w) =
            # 1 - |2*frac(w) - 1| (a triangle wave). fold of a uniform
            # variable is exactly uniform, so the per-pixel marginal is
            # unchanged, while fold is CONTINUOUS across integer w —
            # unlike the previous mod(), whose wrap split ~jfrac of the
            # tiles into draws at BOTH extremes of the disparity range
            # and blew those tiles' s-brackets open to the full volume.
            # |dfold/dw| = 2, so the per-tile span of u is <= jfrac and
            # the kernel's per-tile s-bracket walk (pallas_ncc.TILE_H x
            # TILE_W on the packed grid) skips the planes the tile
            # doesn't touch. jfrac -> 1 at fine scales recovers the pure
            # per-pixel draw.
            from tsar_mvs_tpu.ops import pallas_ncc as pn
            th, tw = pn.TILE_H, pn.TILE_W
            bh, bw = -(-shape[0] // th), -(-shape[1] // tw)
            u_t = jax.random.uniform(jax.random.fold_in(k_z, 7),
                                     (bh, bw), jnp.float32)
            u_t = jnp.repeat(jnp.repeat(u_t, th, 0), tw,
                             1)[:shape[0], :shape[1]]
            jfrac = jnp.minimum(1.0, params.max_disparity
                                * params.refine_block_frac / delta_z)
            w = jnp.mod(u_t + u * (0.5 * jfrac), 1.0)
            u = 1.0 - jnp.abs(2.0 * w - 1.0)
        dz = min_delta + u * (max_delta - min_delta)
        disp_new = jnp.clip(disp_now + dz, params.min_disparity,
                            params.max_disparity)
        depth_new = geo.disparity_depth(f, b, disp_new)

        dn = jax.random.uniform(k_n, shape + (3,), jnp.float32,
                                -delta_n, delta_n)
        n_new = geo.normalize(cur_n + dn)
        n_new = geo.hemisphere_flip(n_new, vv)
        d_new = geo.plane_d_from_depth(n_new, rays, depth_new)

        mv = cost_fn(n_new, d_new, None if pctx is None else parity)
        take = mv.cost < cur_cost
        if upd is not None:
            take = take & upd
        cur_n = jnp.where(take[..., None], n_new, cur_n)
        cur_d = jnp.where(take, d_new, cur_d)
        cur_cost = jnp.where(take, mv.cost, cur_cost)
        cur_ratio = jnp.where(take, mv.ratio, cur_ratio)
        cur_view = jnp.where(take, mv.best_view, cur_view)
        return (cur_n, cur_d, cur_cost, cur_ratio, cur_view), None

    (cur_n, cur_d, cur_cost, cur_ratio, cur_view), _ = jax.lax.scan(
        scale_body, (cur_n, cur_d, cur_cost, cur_ratio, cur_view),
        (deltas, keys))

    if pctx is None:
        return PlaneState(normal=cur_n, d=cur_d, cost=cur_cost,
                          ratio=cur_ratio, best_view=cur_view)
    return PlaneState(
        normal=cb.parity_expand_vec(cur_n, state.normal, parity),
        d=cb.parity_expand(cur_d, state.d, parity),
        cost=cb.parity_expand(cur_cost, state.cost, parity),
        ratio=cb.parity_expand(cur_ratio, state.ratio, parity),
        best_view=cb.parity_expand(cur_view, state.best_view, parity))


def make_patchmatch_step(cost_fn, rays: jnp.ndarray, cams: geo.CameraSet,
                         params: AlgorithmParams,
                         skip_mask: jnp.ndarray | None = None,
                         pctx: ParityCtx | None = None,
                         blocked_refine: bool = False):
    """One full iteration: black prop, black refine, red prop, red refine
    (gipuma.cu:1744-1754 loop body). cost_fn(normal, d, parity) — parity
    None evaluates on the dense grid, 0/1 on the packed half-grid.
    blocked_refine: tile-block the coarse random-search scales (Pallas
    kernel path; see config.refine_block_frac)."""
    def step(it: jnp.ndarray, carry: tuple[PlaneState, jax.Array]):
        state, key = carry
        it_key = jax.random.fold_in(key, it)
        for parity in (0, 1):
            state = _propagation_pass(state, parity, cost_fn, cams,
                                      params, skip_mask, pctx)
            state = _refinement_pass(state, parity,
                                     jax.random.fold_in(it_key, parity),
                                     cost_fn, rays, cams, params,
                                     skip_mask, pctx, blocked_refine)
        return (state, key)
    return step


def _make_pallas_cost_and_ctx(stats, cams: geo.CameraSet, height: int,
                              width: int, vol_data, counts, s_lo: float,
                              s_hi: float, ids, valid,
                              params: AlgorithmParams):
    """cost_fn/pctx assembly for the Pallas s-volume kernel. The kernel
    operates on parity-packed layouts only; dense (init) evaluations
    split into the two parity classes and expand back."""
    from tsar_mvs_tpu.ops import pallas_ncc as pn
    assert cb.parity_compressible(height, width)
    stats_p = {0: ncc.compress_stats(stats, 0),
               1: ncc.compress_stats(stats, 1)}
    pctx = make_parity_ctx(stats_p, cams, height, width)
    vols_p = pn.prepare_parity_volumes(vol_data, height, width)
    inv_ds = tuple((c - 1) / (s_hi - s_lo) for c in counts)

    def mv_packed(n_p, d_p, parity):
        return pn.multiview_cost_pallas(
            vols_p[parity], counts, float(s_lo), inv_ds, ids, valid,
            n_p, d_p, stats_p[parity], params, parity)

    def cost_fn(normal, d, parity=None):
        if parity is not None:
            return mv_packed(normal, d, parity)
        mv = [mv_packed(cb.parity_compress_vec(normal, p),
                        cb.parity_compress(d, p), p) for p in (0, 1)]

        def expand(f0, f1, dtype):
            old = jnp.zeros(f0.shape[:-2] + (height, width), dtype)
            return cb.parity_expand(f1, cb.parity_expand(f0, old, 0), 1)

        return ncc.MultiviewCost(
            cost=expand(mv[0].cost, mv[1].cost, jnp.float32),
            best_view=expand(mv[0].best_view, mv[1].best_view, jnp.int32),
            ratio=expand(mv[0].ratio, mv[1].ratio, jnp.float32))

    return cost_fn, pctx


def _make_cost_and_ctx(stats, cams: geo.CameraSet, height: int,
                       width: int, eval_view_cost, compress=None):
    """Shared plumbing for the parity-packed cost path: returns
    (cost_fn(normal, d, parity), pctx) with parity-compressed RefStats,
    or a dense-only cost_fn and pctx=None when H/W are odd.
    eval_view_cost(normal, d, stats, coords, parity) -> MultiviewCost.
    compress: stats parity-compressor (default ncc.compress_stats; the
    color path passes ncc_color.compress_stats_color)."""
    compress = compress or ncc.compress_stats
    if cb.parity_compressible(height, width):
        stats_p = {None: stats,
                   0: compress(stats, 0),
                   1: compress(stats, 1)}
        pctx = make_parity_ctx(stats_p, cams, height, width)

        def cost_fn(normal, d, parity=None):
            coords = None if parity is None else pctx.coords[parity]
            return eval_view_cost(normal, d, stats_p[parity], coords,
                                  parity=parity)
        return cost_fn, pctx

    def cost_fn(normal, d, parity=None):
        return eval_view_cost(normal, d, stats, None, parity=None)
    return cost_fn, None


def run_patchmatch(key: jax.Array, imgs: jnp.ndarray,
                   view_ids: tuple[int, ...], cams: geo.CameraSet,
                   params: AlgorithmParams,
                   iterations: int | None = None,
                   init_state: PlaneState | None = None,
                   imgs_color: jnp.ndarray | None = None,
                   svol_planes: tuple[int, ...] | None = None,
                   reeval_init_cost: bool = False) -> PlaneState:
    """Full PatchMatch: random (or prior) init + N checkerboard iterations.

    imgs: (V, H, W) float32, index 0 = reference view. Host-side wrapper:
    resolves the NCC sampler (resolve_ncc_impl) and, for the s-volume
    path, derives the static per-view plane counts before entering jit.
    imgs_color (V, 3, H, W) + params.color_processing selects the color
    (float4-equivalent) NCC direct path (ops/ncc_color.py).

    svol_planes: static per-source plane counts override (scene-shared
    counts from svolume_plane_counts_shared keep one compiled program
    per scene instead of one per view). reeval_init_cost: re-evaluate
    `init_state`'s stored costs with THIS configuration's cost function
    inside the jit (pyramid level lifts and priors carry stale or
    foreign-sampler costs; in-jit re-evaluation also makes them
    bit-consistent with the loop's candidate costs).
    """
    H, W = imgs.shape[1:]
    if params.color_processing and imgs_color is not None:
        return _run_patchmatch_color_jit(key, imgs_color, tuple(view_ids),
                                         cams, params, iterations,
                                         init_state,
                                         reeval_init_cost=reeval_init_cost)
    impl = resolve_ncc_impl(params, H, W)
    if impl == "pallas" and not cb.parity_compressible(H, W):
        # 'auto' falls back to svolume here; an explicit request cannot
        # be honored (the kernel runs on the checkerboard-packed (H, W/2)
        # layout, which needs even dims with aligned parity classes).
        raise ValueError(
            f"ncc_impl='pallas' requires parity-compressible dimensions "
            f"(even H and W with aligned parity classes); got {H}x{W}. "
            "Use ncc_impl='auto' (falls back to svolume) or pad the "
            "images to even dimensions.")
    if impl not in ("svolume", "pallas"):
        svol_planes = None
    elif svol_planes is None:
        svol_planes = svolume_plane_counts(cams, view_ids, H, W, params)
    warp_plans = (svolume_warp_plans(cams, view_ids, H, W, params,
                                     svol_planes)
                  if svol_planes is not None else None)
    return _run_patchmatch_jit(key, imgs, tuple(view_ids), cams, params,
                               iterations, init_state, svol_planes,
                               impl == "pallas", reeval_init_cost,
                               warp_plans)


def _reeval_state(state: PlaneState, cost_fn) -> PlaneState:
    """Replace a state's stored cost/ratio/best_view with cost_fn's
    (dense-grid) evaluation of its planes."""
    mv = cost_fn(state.normal, state.d, None)
    return state._replace(cost=mv.cost, ratio=mv.ratio,
                          best_view=mv.best_view)


@functools.partial(jax.jit,
                   static_argnames=("view_ids", "params", "iterations",
                                    "svol_planes", "use_pallas",
                                    "reeval_init_cost", "warp_plans"))
def _run_patchmatch_jit(key: jax.Array, imgs: jnp.ndarray,
                        view_ids: tuple[int, ...], cams: geo.CameraSet,
                        params: AlgorithmParams,
                        iterations: int | None = None,
                        init_state: PlaneState | None = None,
                        svol_planes: tuple[int, ...] | None = None,
                        use_pallas: bool = False,
                        reeval_init_cost: bool = False,
                        warp_plans=None) -> PlaneState:
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)
    init_key, key = jax.random.split(key)
    H, W = imgs.shape[1:]

    if svol_planes is not None and use_pallas:
        idx = jnp.asarray(list(view_ids), jnp.int32)
        s_lo, s_hi = sv.s_range_for_depths(params.depth_min,
                                           params.depth_max,
                                           params.svolume_margin)
        vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx],
                               s_lo, s_hi, svol_planes,
                               warp_plans=warp_plans)
        cost_fn, pctx = _make_pallas_cost_and_ctx(
            stats, cams, H, W, vol.data, svol_planes, s_lo, s_hi, idx,
            [True] * len(view_ids), params)
        if init_state is None:
            init_state = random_init_with(init_key, (H, W), cams,
                                          stats.rays, cost_fn, params)
        elif reeval_init_cost:
            init_state = _reeval_state(init_state, cost_fn)
        iters = params.iterations if iterations is None else iterations
        step = make_patchmatch_step(cost_fn, stats.rays, cams, params,
                                    pctx=pctx,
                                    blocked_refine=params.refine_block_frac
                                    > 0)
        state, _ = jax.lax.fori_loop(0, iters, step, (init_state, key))
        return state

    if svol_planes is not None:
        # Gather-free epipolar s-volume sampler (ops/svolume.py): the
        # volume build is the only gather work; the iteration loop is
        # static shifts + predicated selects on the VPU.
        idx = jnp.asarray(list(view_ids), jnp.int32)
        s_lo, s_hi = sv.s_range_for_depths(params.depth_min,
                                           params.depth_max,
                                           params.svolume_margin)
        vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx],
                               s_lo, s_hi, svol_planes,
                               warp_plans=warp_plans)
        valid = jnp.ones((len(view_ids),), bool)

        def eval_view_cost(normal, d, st, coords, parity=None):
            return sv.multiview_cost_svolume(vol, idx, valid, normal, d,
                                             st, params, parity=parity)
    else:
        # Direct gather sampler: pre-pack source views once (outside the
        # iteration loop) — one gather per bilinear sample.
        packed = {v: sampling.pack_image(imgs[v], jnp.bfloat16)
                  for v in view_ids}

        if H * W >= VIEWSCAN_MIN_PIXELS and params.n_best == 1:
            # Large images: scan the view axis so one view's working set
            # is live at a time (unrolled views fault the TPU worker at
            # 2K x 7 sources — HBM pressure).
            packed_stack = jnp.stack([packed[v].data for v in view_ids])
            idx = jnp.asarray(list(view_ids), jnp.int32)
            A_stack = cams.A[idx]
            b_stack = cams.b[idx]
            valid = jnp.ones((len(view_ids),), bool)

            def eval_view_cost(normal, d, st, coords, parity=None):
                return ncc.multiview_cost_viewscan(
                    packed_stack, H, W, A_stack, b_stack, idx, valid,
                    normal, d, st, params, coords=coords)
        else:
            def eval_view_cost(normal, d, st, coords, parity=None):
                return ncc.multiview_cost(packed, view_ids, cams, normal,
                                          d, st, params, coords=coords)

    cost_fn, pctx = _make_cost_and_ctx(stats, cams, H, W, eval_view_cost)

    if init_state is None:
        init_state = random_init_with(init_key, (H, W), cams, stats.rays,
                                      cost_fn, params)
    elif reeval_init_cost:
        init_state = _reeval_state(init_state, cost_fn)
    iters = params.iterations if iterations is None else iterations
    step = make_patchmatch_step(cost_fn, stats.rays, cams, params,
                                pctx=pctx)
    state, _ = jax.lax.fori_loop(0, iters, step, (init_state, key))
    return state


@functools.partial(jax.jit,
                   static_argnames=("view_ids", "params", "iterations",
                                    "reeval_init_cost"))
def _run_patchmatch_color_jit(key: jax.Array, imgs_color: jnp.ndarray,
                              view_ids: tuple[int, ...],
                              cams: geo.CameraSet,
                              params: AlgorithmParams,
                              iterations: int | None = None,
                              init_state: PlaneState | None = None,
                              reeval_init_cost: bool = False
                              ) -> PlaneState:
    """`-color_processing` PatchMatch: 3-channel bilateral NCC on the
    direct sampler (ops/ncc_color.py documents the float4-intent
    semantics and the reference divergence)."""
    from tsar_mvs_tpu.ops import ncc_color as nc
    V, _, H, W = imgs_color.shape
    stats = nc.precompute_ref_stats_color(imgs_color[0], cams, params)
    packed = {v: nc.pack_image_color(imgs_color[v]) for v in view_ids}

    if H * W >= VIEWSCAN_MIN_PIXELS and params.n_best == 1:
        # Large images: scan the view axis so one view's 3-channel
        # working set is live at a time — with views unrolled all views'
        # packed channels coexist in HBM, the exact shape that faults
        # the TPU worker at 2K x 7 sources in grayscale (color triples
        # the pressure; advisor r4 medium).
        stack = jnp.stack([jnp.stack([p.data for p in packed[v]])
                           for v in view_ids])
        idx = jnp.asarray(list(view_ids), jnp.int32)
        A_stack = cams.A[idx]
        b_stack = cams.b[idx]
        valid = jnp.ones((len(view_ids),), bool)

        def eval_view_cost(normal, d, st, coords, parity=None):
            return nc.multiview_cost_color_viewscan(
                stack, H, W, A_stack, b_stack, idx, valid, normal, d,
                st, params, coords=coords)
    else:
        def eval_view_cost(normal, d, st, coords, parity=None):
            return nc.multiview_cost_color(packed, view_ids, cams,
                                           normal, d, st, params,
                                           coords=coords)

    cost_fn, pctx = _make_cost_and_ctx(stats, cams, H, W, eval_view_cost,
                                       compress=nc.compress_stats_color)
    init_key, key = jax.random.split(key)
    if init_state is None:
        init_state = random_init_with(init_key, (H, W), cams, stats.rays,
                                      cost_fn, params)
    elif reeval_init_cost:
        init_state = _reeval_state(init_state, cost_fn)
    iters = params.iterations if iterations is None else iterations
    step = make_patchmatch_step(cost_fn, stats.rays, cams, params,
                                pctx=pctx)
    state, _ = jax.lax.fori_loop(0, iters, step, (init_state, key))
    return state


# ---------------------------------------------------------------------------
# Batched multi-reference-view runner — the unit that shards over a
# `("view",)` device mesh (SURVEY.md §2 "per-view task parallelism": the
# reference's shell loop over views, scripts/courtyard.sh:28-48, becomes a
# data-parallel axis).
# ---------------------------------------------------------------------------

class SceneBatch(NamedTuple):
    """Per-reference-view batch arrays for `run_patchmatch_many`.

    R reference views, each matched against up to S source views. All
    geometry is in each reference view's own rebased frame; the shared
    scalars (K, depth range) live in `cams`.
    """
    ref_ids: jnp.ndarray    # (R,)   int32 index into imgs
    src_ids: jnp.ndarray    # (R, S) int32 index into imgs
    src_valid: jnp.ndarray  # (R, S) bool (padding mask)
    A: jnp.ndarray          # (R, S, 3, 3) K R_rel K^-1 per (ref, src)
    b: jnp.ndarray          # (R, S, 3)    K t_rel


def build_scene_batch(P_list, ref_ids: Sequence[int],
                      src_ids_per_ref: Sequence[Sequence[int]],
                      num_src: int, cam_scale: float = 1.0) -> SceneBatch:
    """Host-side construction of the (R, S) warp-factor arrays from raw
    projection matrices + a view-selection table (pair.txt contract)."""
    import numpy as np
    Ks, Rs, ts = [], [], []
    for P in P_list:
        K, R, C = geo.decompose_projection(np.asarray(P, np.float64))
        Ks.append(geo.scale_K(K, cam_scale))
        Rs.append(R)
        ts.append(-R @ C)
    K_ref = Ks[0]
    K_inv = np.linalg.inv(K_ref)

    R_ = len(ref_ids)
    S = num_src
    A = np.zeros((R_, S, 3, 3))
    b = np.zeros((R_, S, 3))
    sid = np.zeros((R_, S), np.int32)
    valid = np.zeros((R_, S), bool)
    for i, ref in enumerate(ref_ids):
        for j, src in enumerate(list(src_ids_per_ref[i])[:S]):
            R_rel = Rs[src] @ Rs[ref].T
            t_rel = ts[src] - R_rel @ ts[ref]
            A[i, j] = K_ref @ R_rel @ K_inv
            b[i, j] = K_ref @ t_rel
            sid[i, j] = src
            valid[i, j] = True
    return SceneBatch(ref_ids=jnp.asarray(np.asarray(ref_ids, np.int32)),
                      src_ids=jnp.asarray(sid),
                      src_valid=jnp.asarray(valid),
                      A=jnp.asarray(A, jnp.float32),
                      b=jnp.asarray(b, jnp.float32))


def patchmatch_one_ref(key: jax.Array, imgs: jnp.ndarray,
                       ref_id: jnp.ndarray, src_ids: jnp.ndarray,
                       src_valid: jnp.ndarray, A: jnp.ndarray,
                       b: jnp.ndarray, cams: geo.CameraSet,
                       params: AlgorithmParams,
                       iterations: int,
                       svol_planes: tuple[int, ...] | None = None,
                       init_state: PlaneState | None = None
                       ) -> PlaneState:
    """PatchMatch for one reference view with *traced* view indices and
    warp factors (the shardable unit). svol_planes: static per-source-slot
    plane counts enabling the s-volume sampler (traced A/b are fine —
    only the counts must be static; use the max over the batch).
    init_state: lifted prior planes (pyramid level); their costs are
    re-evaluated with this configuration's cost function."""
    ref_img = imgs[ref_id]
    src_imgs = imgs[src_ids]                 # (S, H, W) dynamic gather
    stats = ncc.precompute_ref_stats(ref_img, cams, params)
    H, W = ref_img.shape

    if svol_planes is not None:
        s_lo, s_hi = sv.s_range_for_depths(params.depth_min,
                                           params.depth_max,
                                           params.svolume_margin)
        vol = sv.build_svolume(src_imgs, A, b, s_lo, s_hi, svol_planes)

        if resolve_ncc_impl(params, H, W) == "pallas":
            # The Mosaic kernel path (traced A/b are fine — the plane
            # counts are static via svol_planes; src_valid masks per
            # slot inside the view aggregation).
            cost_fn, pctx = _make_pallas_cost_and_ctx(
                stats, cams, H, W, vol.data, svol_planes, s_lo, s_hi,
                src_ids, src_valid, params)
            blocked = params.refine_block_frac > 0
        else:
            def eval_view_cost(normal, d, st, coords, parity=None):
                return sv.multiview_cost_svolume(vol, src_ids, src_valid,
                                                 normal, d, st, params,
                                                 parity=parity)
            cost_fn, pctx = _make_cost_and_ctx(stats, cams, H, W,
                                               eval_view_cost)
            blocked = False
        init_key, key = jax.random.split(key)
        if init_state is None:
            init_state = random_init_with(init_key, (H, W), cams,
                                          stats.rays, cost_fn, params)
        # else: lifted states carry their coarse-level costs (stale
        # costs anchor the prior; re-evaluating through the coarse
        # volume displaces it — see run_patchmatch_pyramid docstring).
        step = make_patchmatch_step(cost_fn, stats.rays, cams, params,
                                    pctx=pctx, blocked_refine=blocked)
        state, _ = jax.lax.fori_loop(0, iterations, step,
                                     (init_state, key))
        return state

    packed_src = tuple(sampling.pack_image(src_imgs[s], jnp.bfloat16)
                       for s in range(src_imgs.shape[0]))

    if H * W >= VIEWSCAN_MIN_PIXELS and params.n_best == 1:
        packed_stack = jnp.stack([p.data for p in packed_src])

        def eval_view_cost(normal, d, st, coords, parity=None):
            return ncc.multiview_cost_viewscan(
                packed_stack, H, W, A, b, src_ids, src_valid, normal, d,
                st, params, coords=coords)
    else:
        def eval_view_cost(normal, d, st, coords, parity=None):
            return ncc.multiview_cost_gathered(packed_src, A, b, src_ids,
                                               src_valid, normal, d, st,
                                               params, coords=coords)

    cost_fn, pctx = _make_cost_and_ctx(stats, cams, H, W, eval_view_cost)

    init_key, key = jax.random.split(key)
    if init_state is None:
        init_state = random_init_with(init_key, (H, W), cams, stats.rays,
                                      cost_fn, params)
    # else: stale coarse costs ride along (see run_patchmatch_pyramid).

    step = make_patchmatch_step(cost_fn, stats.rays, cams, params,
                                pctx=pctx)
    state, _ = jax.lax.fori_loop(0, iterations, step, (init_state, key))
    return state


def run_patchmatch_many(key: jax.Array, imgs: jnp.ndarray,
                        batch: SceneBatch, cams: geo.CameraSet,
                        params: AlgorithmParams,
                        iterations: int,
                        svol_planes: tuple[int, ...] | None = None,
                        init_states: PlaneState | None = None
                        ) -> PlaneState:
    """Sequentially map PatchMatch over a batch of reference views
    (stacked PlaneState out, leading axis R). Each device in a
    view-sharded mesh runs this over its local shard. init_states:
    stacked lifted priors (leading axis R), e.g. from a coarser pyramid
    level."""
    R = batch.ref_ids.shape[0]

    def one(r):
        # Fold by the *global* reference id so sharded shards of the same
        # batch never collide on the PRNG stream.
        init_r = (None if init_states is None
                  else jax.tree.map(lambda a: a[r], init_states))
        return patchmatch_one_ref(
            jax.random.fold_in(key, batch.ref_ids[r]), imgs,
            batch.ref_ids[r],
            batch.src_ids[r], batch.src_valid[r], batch.A[r], batch.b[r],
            cams, params, iterations, svol_planes=svol_planes,
            init_state=init_r)

    return jax.lax.map(one, jnp.arange(R))


def svolume_plane_counts_batch(batch: SceneBatch, height: int, width: int,
                               params: AlgorithmParams
                               ) -> tuple[int, ...] | None:
    """Static per-source-slot plane counts for a SceneBatch (host side,
    concrete batch): the max over reference views per slot, so one count
    tuple serves every ref in the (possibly sharded) batch."""
    if resolve_ncc_impl(params, height, width) not in ("svolume", "pallas"):
        return None
    import numpy as np
    A = np.asarray(batch.A)          # (R, S, 3, 3)
    b = np.asarray(batch.b)
    s_lo, s_hi = sv.s_range_for_depths(params.depth_min, params.depth_max,
                                       params.svolume_margin)
    R, S = A.shape[:2]
    counts = np.zeros((R, S), np.int64)
    for r in range(R):
        counts[r] = sv.plane_counts(A[r], b[r], height, width, s_lo, s_hi,
                                    step_px=params.svolume_step_px)
    out = counts.max(axis=0)
    # Apply the memory budget across slots.
    budget = params.svolume_budget_mb << 20
    step = params.svolume_step_px
    while out.sum() * height * width * 2 > budget and step < 64.0:
        step *= 1.5
        for r in range(R):
            counts[r] = sv.plane_counts(A[r], b[r], height, width, s_lo,
                                        s_hi, step_px=step)
        out = counts.max(axis=0)
    return tuple(int(c) for c in out)


# ---------------------------------------------------------------------------
# Coarse-to-fine pyramid PatchMatch — the prior generator.
#
# The reference's prior stage APD is itself a multi-scale edge-aware
# PatchMatch (SURVEY.md §2 #28: per-view depth_1..14.jpg / edges_0..3
# intermediates); running our own matcher coarse-to-fine subsumes its
# role: at coarse scales the NCC window spans textureless regions plus
# their textured surround, so their interiors get approximately-correct
# planes that survive to full resolution as the prior TSAR refines.
# ---------------------------------------------------------------------------

def downsample_2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x area-average downsample (per-view, device-side)."""
    H2 = (img.shape[-2] // 2) * 2
    W2 = (img.shape[-1] // 2) * 2
    img = img[..., :H2, :W2]
    return 0.25 * (img[..., 0::2, 0::2] + img[..., 0::2, 1::2]
                   + img[..., 1::2, 0::2] + img[..., 1::2, 1::2])


def upsample_state_2x(state: PlaneState, cams_fine: geo.CameraSet,
                      height: int, width: int) -> PlaneState:
    """Lift a coarse plane field to the next finer scale: nearest-repeat
    the normals and the induced *depth* (scale-invariant), then rebuild d
    against the finer intrinsics."""
    Hc, Wc = state.shape
    depth_c = depth_map_with_f(state, cams_fine, coarse_shape=(Hc, Wc))
    def up(a):
        a = jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)
        a = a[:height, :width]
        pad_h = height - a.shape[0]
        pad_w = width - a.shape[1]
        if pad_h or pad_w:
            a = jnp.pad(a, [(0, pad_h), (0, pad_w)]
                        + [(0, 0)] * (a.ndim - 2), mode="edge")
        return a
    normal = jnp.stack([up(state.normal[..., k]) for k in range(3)],
                       axis=-1)
    depth = up(depth_c)
    rays = geo.pixel_rays(cams_fine, height, width)
    d = geo.plane_d_from_depth(normal, rays, depth)
    return PlaneState(normal=normal, d=d,
                      cost=up(state.cost), ratio=up(state.ratio),
                      best_view=up(state.best_view))


def depth_map_with_f(state: PlaneState, cams_fine: geo.CameraSet,
                     coarse_shape: tuple[int, int]) -> jnp.ndarray:
    """Depth of a coarse state using coarse intrinsics (K/2): fx, cx, cy
    halve with the image (scale_K semantics)."""
    Hc, Wc = coarse_shape
    xx = jnp.arange(Wc, dtype=jnp.float32)[None, :]
    yy = jnp.arange(Hc, dtype=jnp.float32)[:, None]
    f_c = cams_fine.f * 0.5
    cx_c = cams_fine.cx * 0.5
    cy_c = cams_fine.cy * 0.5
    denom = (state.normal[..., 0] * (xx - cx_c)
             + state.normal[..., 1] * (yy - cy_c) * cams_fine.alpha
             + state.normal[..., 2] * f_c)
    return -state.d * f_c / denom


def run_patchmatch_pyramid(key: jax.Array, imgs: jnp.ndarray,
                           view_ids: tuple[int, ...], P_list,
                           params: AlgorithmParams,
                           levels: tuple[int, ...] = (4, 2, 1),
                           iterations_per_level: tuple[int, ...] | None
                           = None,
                           depth_min: float | None = None,
                           depth_max: float | None = None,
                           imgs_color: jnp.ndarray | None = None,
                           svol_planes_per_level: Sequence[
                               tuple[int, ...] | None] | None = None
                           ) -> PlaneState:
    """Coarse-to-fine PatchMatch over `levels` (downsample factors,
    coarse to fine, last must be 1). Returns the full-resolution state.

    P_list: raw (unscaled) projection matrices in pipeline order
    (index 0 = reference). imgs_color (V, 3, H, W): color NCC mode
    (downsample_2x pyramids the trailing dims, so channels ride along).
    svol_planes_per_level: per-level static plane-count overrides
    (scene-shared counts so every reference view reuses one compiled
    program per level; see svolume_plane_counts_shared).

    Lifted states CARRY their coarse-level costs into the next level
    (no re-evaluation). Round 5 measured both alternatives at the 2K
    budget-coarsened point: the eager direct-sampler re-eval costs
    ~25% of the whole PatchMatch stage (13.6 s of 45.9 s at
    672x1024x3src), and an in-jit re-eval through the level's own
    s-volume sampler DESTROYS the prior (acc<2% 0.987 -> 0.66 at 2K:
    at ~10 px budget plane spacing the re-evaluated costs are blurry
    enough that the loop displaces good lifted planes wholesale).
    Stale coarse costs anchor the prior correctly — the coarser level
    evaluated them at its own relatively finer volume — and cost
    nothing: 50.2 s vs 57.0 s (reeval) vs 89.3 s (r4 eager) PatchMatch
    at 2Kx8it/7src, acc2_pm 0.9868 == r4.
    """
    import dataclasses
    assert levels[-1] == 1
    if iterations_per_level is None:
        iterations_per_level = iteration_schedule(params, len(levels))
    dmin = params.depth_min if depth_min is None else depth_min
    dmax = params.depth_max if depth_max is None else depth_max
    color = params.color_processing and imgs_color is not None

    # Image pyramids (device-side).
    pyr = {1: imgs}
    pyr_c = {1: imgs_color}
    fac = 1
    cur = imgs
    cur_c = imgs_color
    while fac < max(levels):
        cur = downsample_2x(cur)
        if color:
            cur_c = downsample_2x(cur_c)
        fac *= 2
        pyr[fac] = cur
        pyr_c[fac] = cur_c

    state = None
    for li, s in enumerate(levels):
        cams_s = geo.build_camera_set(P_list,
                                      cam_scale=float(s) * params.cam_scale,
                                      depth_min=dmin, depth_max=dmax)
        params_s = dataclasses.replace(
            params,
            # Levels with a lifted prior narrow the first random-search
            # scale (config.refine_dz0_frac_fine): the coarse level
            # already did the reference's full exploration.
            refine_dz0_frac=(params.refine_dz0_frac if li == 0
                             else min(params.refine_dz0_frac,
                                      params.refine_dz0_frac_fine)),
            # Lifted levels can drop the far propagation combs
            # (config.prop_banks_fine); the coarsest keeps all 8.
            prop_banks=(params.prop_banks if li == 0
                        else min(params.prop_banks,
                                 params.prop_banks_fine)),
        ).with_depth_range(dmin, dmax, float(cams_s.f))
        imgs_s = pyr[s]
        if state is not None:
            Hs, Ws = imgs_s.shape[1:]
            state = upsample_state_2x(state, cams_s, Hs, Ws)
        planes_li = (svol_planes_per_level[li]
                     if svol_planes_per_level is not None else None)
        state = run_patchmatch(jax.random.fold_in(key, li), imgs_s,
                               view_ids, cams_s, params_s,
                               iterations=iterations_per_level[li],
                               init_state=state,
                               imgs_color=pyr_c[s] if color else None,
                               svol_planes=planes_li,
                               reeval_init_cost=False)
    return state
