"""TSAR refinement pipeline: textureless-aware segmentation and
correlative refinement of a per-view plane field.

Orchestrates the full reference pipeline (main() call stack, SURVEY.md
§3.1) on one reference view:

1. prior ingestion or own PatchMatch      (firstcuda / gipuma_get_disp)
2. confidence + left-right check          (gipuma_getlrdiff, gipuma_getview)
3. coarse-to-fine WMF outlier marking     (4x gipuma_WMF — the full-design
                                           loop, gipuma.cu:1809-1812)
4. per-region RANSAC plane fit            (main.cpp:1519-1730)
5. textureless fill                       (fakecuda + fillcuda,
                                           gipuma_update_scale[_2])
6. fine WMF hole filling                  (6x gipuma_WMF_Final,
                                           gipuma.cu:1844-1847)
7. finalize: world-frame normals + metric depth (gipuma_compute_disp)

Stages 2-3 and 5-7 run as jitted device programs; stage 4 loops over the
(data-dependent) trueweak regions on the host, each fit a single jitted
batched-RANSAC call with bucket-padded point counts.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.models import ransac
from tsar_mvs_tpu.models.patchmatch import PlaneState
from tsar_mvs_tpu.models.weak_texture import WeakTexture
from tsar_mvs_tpu.ops import ncc, wmf


@dataclass
class TsarResult:
    depth: np.ndarray          # (H, W) metric depth (TSAR_disp.dmb payload)
    normal_world: np.ndarray   # (H, W, 3) world-frame normals
    normal_cam: np.ndarray     # (H, W, 3) rebased-ref-frame normals
    cost: np.ndarray           # (H, W)
    confidence: np.ndarray     # (H, W)
    reliable: np.ndarray       # (H, W) bool (lines->scale)
    region_planes: np.ndarray  # (M, 4) fitted planes (0 for non-weak)


@functools.partial(jax.jit, static_argnames=("view_ids", "params"))
def confidence_stage(imgs: jnp.ndarray, view_ids: tuple[int, ...],
                     cams: geo.CameraSet, state: PlaneState,
                     params: AlgorithmParams):
    """gipuma_getlrdiff + gipuma_getview (gipuma.cu:1160-1213): reverse
    cost at the best view, lrdiff = |c - rc| clamped to 1, confidence
    ((2-c)/2 + (1-lrdiff))/2, plus the per-pixel disparity map. The
    reverse cost runs once per pixel at its best view (fused gather),
    exactly as the reference does — not once per view."""
    rl = ncc.rl_cost_fused(imgs[0], imgs, state.best_view, view_ids, cams,
                           state.normal, state.d, params)
    lrdiff = jnp.minimum(jnp.abs(state.cost - rl), params.lr_diff_clamp)
    confid = ((2.0 - state.cost) / 2.0 + (1.0 - lrdiff)) / 2.0
    H, W = imgs.shape[1:]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth = geo.depth_from_plane(cams, state.normal, state.d, xx, yy)
    disp = geo.disparity_depth(cams.f, cams.baseline, depth)
    return confid, lrdiff, disp


def wmf_stage(ref_img: jnp.ndarray, cams: geo.CameraSet, state: PlaneState,
              disp: jnp.ndarray, reliable: jnp.ndarray,
              params: AlgorithmParams, iters: int = 4):
    """Coarse-to-fine WMF outlier marking (4x gipuma_WMF). Each pass is
    its own jitted program: fusing multiple WMF passes into one XLA
    program crashes/stalls the TPU compiler (observed on v5e), and the
    reference likewise launches one kernel per pass
    (gipuma.cu:1809-1812)."""
    rays = geo.pixel_rays(cams, *ref_img.shape)
    for it in range(iters):
        reliable = wmf.wmf_mark_outliers(ref_img, state.normal, state.d,
                                         disp, reliable, it, cams, rays,
                                         params)
    return reliable


def fit_region_planes(key: jax.Array, weak: WeakTexture,
                      disp: jnp.ndarray, reliable: np.ndarray,
                      cams: geo.CameraSet, params: AlgorithmParams,
                      lsq_polish: bool = True) -> np.ndarray:
    """Per-trueweak-region RANSAC (main.cpp:1519-1730). Returns (M, 4)
    planes in the rebased ref frame (rows of zeros for non-weak regions).

    Point sets are bucket-padded to limit jit recompiles; regions with
    > ransac_max_points reliable pixels are subsampled like the
    reference's shuffle-and-truncate (main.cpp:1538-1549).
    """
    H, W = disp.shape
    rays = np.asarray(geo.pixel_rays(cams, H, W))
    depth = np.asarray(geo.disparity_depth(float(cams.f),
                                           float(cams.baseline),
                                           np.asarray(disp)))
    pts_all = depth[..., None] * rays

    labels = weak.labels_full
    planes = np.zeros((weak.num_regions, 4), np.float32)
    rng = np.random.default_rng(np.asarray(
        jax.random.key_data(key)).ravel()[-1])
    from scipy import ndimage as _ndi

    for region in np.nonzero(weak.text == -1)[0]:
        rmask = labels == region
        if params.ransac_ring > 0:
            rmask = _ndi.binary_dilation(rmask,
                                         iterations=params.ransac_ring)
        mask = rmask & reliable
        ys, xs = np.nonzero(mask)
        if ys.size < 3:
            continue
        if ys.size > params.ransac_max_points:
            sel = rng.permutation(ys.size)[:params.ransac_max_points]
            ys, xs = ys[sel], xs[sel]
        pts = pts_all[ys, xs].astype(np.float32)
        # Bucket-pad N to limit recompilation.
        n = pts.shape[0]
        bucket = 1 << max(10, (n - 1).bit_length())
        pad = np.zeros((bucket - n, 3), np.float32)
        pts_p = jnp.asarray(np.concatenate([pts, pad]))
        valid = jnp.asarray(np.arange(bucket) < n)
        thr0 = ransac.initial_threshold(int(weak.size[region]),
                                        params.ransac_thr_base)
        fit = ransac.ransac_plane(jax.random.fold_in(key, int(region)),
                                  pts_p, valid, thr0,
                                  iters=params.ransac_iters,
                                  anneal_rounds=params.ransac_anneal_rounds,
                                  lsq_polish=lsq_polish,
                                  thr_max=params.ransac_thr_max,
                                  thr_step=params.ransac_thr_step)
        planes[region] = np.asarray(fit.plane)
    return planes


@functools.partial(jax.jit, static_argnames=("params",))
def fill_stage(cams: geo.CameraSet, state: PlaneState,
               region_planes: jnp.ndarray, labels: jnp.ndarray,
               weak_region: jnp.ndarray, reliable: jnp.ndarray,
               params: AlgorithmParams):
    """Textureless fill (gipuma_update_scale via fillcuda,
    gipuma.cu:1215-1259): weak pixels take their region plane
    (hemisphere-oriented, all four components flipped), cost 0,
    reliable; returns updated state + reliability + disparity."""
    H, W = labels.shape
    plane_px = region_planes[labels]            # (H, W, 4)
    n_r = plane_px[..., :3]
    d_r = plane_px[..., 3]
    vv = geo.view_vectors(cams, H, W)
    dp = jnp.sum(n_r * vv, axis=-1)
    flip = dp > 0.0
    n_r = jnp.where(flip[..., None], -n_r, n_r)
    d_r = jnp.where(flip, -d_r, d_r)

    is_weak = weak_region[labels]               # (H, W) bool
    has_plane = jnp.any(plane_px != 0.0, axis=-1)
    fill = is_weak & has_plane

    normal = jnp.where(fill[..., None], n_r, state.normal)
    d = jnp.where(fill, d_r, state.d)
    cost = jnp.where(fill, 0.0, state.cost)
    reliable = reliable | fill

    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth = geo.depth_from_plane(cams, normal, d, xx, yy)
    disp = geo.disparity_depth(cams.f, cams.baseline, depth)
    new_state = PlaneState(normal=normal, d=d, cost=cost,
                           ratio=state.ratio, best_view=state.best_view)
    return new_state, reliable, disp


@functools.partial(jax.jit, static_argnames=("params",))
def fake_depth_stage(cams: geo.CameraSet, region_planes: jnp.ndarray,
                     labels: jnp.ndarray, weak_region: jnp.ndarray,
                     params: AlgorithmParams) -> jnp.ndarray:
    """gipuma_update_scale_2 via fakecuda (gipuma.cu:1261-1292): the
    region plane's induced depth for weak pixels (feeds the border
    consistency check)."""
    H, W = labels.shape
    plane_px = region_planes[labels]
    n_r = plane_px[..., :3]
    d_r = plane_px[..., 3]
    vv = geo.view_vectors(cams, H, W)
    flip = jnp.sum(n_r * vv, axis=-1) > 0.0
    n_r = jnp.where(flip[..., None], -n_r, n_r)
    d_r = jnp.where(flip, -d_r, d_r)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth = geo.depth_from_plane(cams, n_r, d_r, xx, yy)
    return jnp.where(weak_region[labels], depth, 0.0)


def wmf_final_stage(ref_img: jnp.ndarray, cams: geo.CameraSet,
                    state: PlaneState, disp: jnp.ndarray,
                    reliable: jnp.ndarray, textured: jnp.ndarray,
                    params: AlgorithmParams, iters: int = 6):
    """Fine WMF hole filling (6x gipuma_WMF_Final); one jitted program
    per pass (see wmf_stage)."""
    rays = geo.pixel_rays(cams, *ref_img.shape)
    normal, d = state.normal, state.d
    for it in range(iters):
        normal, d, disp, reliable = wmf.wmf_fill(
            ref_img, normal, d, disp, reliable, textured, it, cams, rays,
            params)
    return PlaneState(normal=normal, d=d, cost=state.cost,
                      ratio=state.ratio,
                      best_view=state.best_view), disp, reliable


@functools.partial(jax.jit, static_argnames=("drift_thr",))
def prior_drift_revert(cams: geo.CameraSet, state: PlaneState,
                       prior_normal: jnp.ndarray, prior_d: jnp.ndarray,
                       drift_thr: float = 6.0) -> PlaneState:
    """gipuma_compute_disp_final's revert clause (gipuma.cu:757-808,
    uncalled in the reference snapshot): pixels whose refined disparity
    drifted more than `drift_thr` from the prior's take the prior plane
    back. Opt-in (the snapshot never invokes it); useful when a trusted
    APD prior exists."""
    H, W = state.d.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    disp_new = geo.disparity_depth(
        cams.f, cams.baseline,
        geo.depth_from_plane(cams, state.normal, state.d, xx, yy))
    disp_prior = geo.disparity_depth(
        cams.f, cams.baseline,
        geo.depth_from_plane(cams, prior_normal, prior_d, xx, yy))
    revert = jnp.abs(disp_new - disp_prior) > drift_thr
    return PlaneState(
        normal=jnp.where(revert[..., None], prior_normal, state.normal),
        d=jnp.where(revert, prior_d, state.d),
        cost=state.cost, ratio=state.ratio, best_view=state.best_view)


@jax.jit
def finalize_stage(cams: geo.CameraSet, state: PlaneState):
    """gipuma_compute_disp (gipuma.cu:810-844): rotate normals back to the
    world frame with R_orig_inv; the plane offset slot becomes the metric
    depth (0 where cost is MAXCOST)."""
    H, W = state.d.shape
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    depth = geo.depth_from_plane(cams, state.normal, state.d, xx, yy)
    depth = jnp.where(state.cost != ncc.MAXCOST, depth, 0.0)
    n_world = geo.matvec3(cams.R_orig_inv[0], state.normal)
    return depth, n_world


def border_consistency_check(weak: WeakTexture, fake_depth: np.ndarray,
                             disp: np.ndarray, cams: geo.CameraSet
                             ) -> np.ndarray:
    """Region border depth-jump statistic (main.cpp:1735-1780 — present in
    the reference behind `if (false)`). Returns per-region mean |depth
    jump| across the region border; callers may use it to veto implausible
    fills."""
    labels = weak.labels_full
    depth = np.asarray(geo.disparity_depth(float(cams.f),
                                           float(cams.baseline),
                                           np.asarray(disp)))
    depdif = np.zeros(weak.num_regions)
    borlen = np.zeros(weak.num_regions)
    weak_px = (weak.text == -1)[labels]
    for axis, shift in ((1, 1), (1, -1), (0, 1), (0, -1)):
        nb_lab = np.roll(labels, shift, axis=axis)
        nb_depth = np.roll(depth, shift, axis=axis)
        edge = weak_px & (nb_lab != labels)
        # Exclude wrap-around border.
        if axis == 1:
            col = 0 if shift == 1 else -1
            edge[:, col] = False
        else:
            row = 0 if shift == 1 else -1
            edge[row, :] = False
        np.add.at(borlen, labels[edge], 1)
        np.add.at(depdif, labels[edge],
                  np.abs(fake_depth[edge] - nb_depth[edge]))
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(borlen > 0, depdif / borlen, 0.0)


def tsar_refine(imgs: np.ndarray, cams: geo.CameraSet,
                view_ids: Sequence[int], params: AlgorithmParams,
                state: PlaneState, weak: WeakTexture,
                reliable_seed: np.ndarray | None, key: jax.Array,
                wmf_iters: int | None = None,
                wmf_final_iters: int | None = None,
                lsq_polish: bool = True) -> TsarResult:
    """Full TSAR refinement of a PatchMatch (or prior) plane field."""
    imgs_j = jnp.asarray(imgs, jnp.float32)
    view_ids = tuple(int(v) for v in view_ids)
    H, W = imgs.shape[1:]

    confid, lrdiff, disp = confidence_stage(imgs_j, view_ids, cams, state,
                                            params)

    if reliable_seed is None:
        reliable = jnp.ones((H, W), bool)
    else:
        reliable = jnp.asarray(reliable_seed, bool)

    n_wmf = params.wmf_iters if wmf_iters is None else wmf_iters
    if n_wmf > 0:
        reliable = wmf_stage(imgs_j[0], cams, state, disp, reliable,
                             params, iters=n_wmf)

    region_planes = fit_region_planes(key, weak, disp,
                                      np.asarray(reliable), cams, params,
                                      lsq_polish=lsq_polish)

    labels = jnp.asarray(weak.labels_full)
    weak_region = jnp.asarray(weak.text == -1)

    if params.border_check:
        # fakecuda -> border-consistency veto (gipuma.cu:1852-1877 +
        # main.cpp:1735-1780; the reference computes fakedepth but the
        # veto sits behind `if (false)` — opt-in here): drop region
        # planes whose filled depth jumps more than
        # border_check_thr * depth_min across the region border.
        fake = np.asarray(fake_depth_stage(cams, jnp.asarray(region_planes),
                                           labels, weak_region, params))
        jump = border_consistency_check(weak, fake, np.asarray(disp), cams)
        veto = jump > params.border_check_thr * params.depth_min
        region_planes = np.where(veto[:, None], 0.0,
                                 region_planes).astype(np.float32)

    planes_j = jnp.asarray(region_planes)

    state2, reliable2, disp2 = fill_stage(cams, state, planes_j, labels,
                                          weak_region, reliable, params)

    textured = jnp.asarray(weak.text == 1)[labels]
    n_final = (params.wmf_final_iters if wmf_final_iters is None
               else wmf_final_iters)
    if n_final > 0:
        state2, disp2, reliable2 = wmf_final_stage(
            imgs_j[0], cams, state2, disp2, reliable2, textured, params,
            iters=n_final)

    depth, n_world = finalize_stage(cams, state2)
    return TsarResult(depth=np.asarray(depth),
                      normal_world=np.asarray(n_world),
                      normal_cam=np.asarray(state2.normal),
                      cost=np.asarray(state2.cost),
                      confidence=np.asarray(confid),
                      reliable=np.asarray(reliable2),
                      region_planes=region_planes)
