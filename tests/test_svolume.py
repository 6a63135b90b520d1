"""Oracle tests: the epipolar s-volume NCC path against the direct
gather sampler (ncc.multiview_cost). The two differ by interpolation
order only (svolume.py module docstring), so costs must agree tightly
away from image borders and the argmin-over-candidates decisions must
be essentially identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops import ncc
from tsar_mvs_tpu.ops import svolume as sv
from tsar_mvs_tpu.utils.synthetic import make_scene


@pytest.fixture(scope="module")
def scene_setup():
    scene = make_scene(height=48, width=64, num_views=4, seed=1)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = (1, 2, 3)
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)

    idx = jnp.asarray(view_ids, jnp.int32)
    s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max,
                                       params.svolume_margin)
    S = sv.plane_counts(np.asarray(cams.A[idx]), np.asarray(cams.b[idx]),
                        48, 64, s_lo, s_hi)
    vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx],
                           s_lo, s_hi, S)
    return scene, cams, params, imgs, view_ids, stats, vol


def _random_plane_field(key, cams, scene, shape):
    k1, k2 = jax.random.split(key)
    n = jax.random.normal(k1, shape + (3,))
    n = geo.normalize(n)
    vv = geo.view_vectors(cams, *shape)
    n = geo.hemisphere_flip(n, vv)
    depth = jax.random.uniform(k2, shape, jnp.float32,
                               scene.depth_min * 1.02,
                               scene.depth_max * 0.98)
    rays = geo.pixel_rays(cams, *shape)
    d = geo.plane_d_from_depth(n, rays, depth)
    return n, d


def _inbounds_mask(scene, n, d, stats, params):
    """Windows whose full s-range stays inside the volume (outside it
    the svolume path clamps to the range-limit plane — the documented
    divergence, svolume.py module docstring)."""
    s0, sx, sy = sv.plane_scalars(n, d, stats)
    s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max,
                                       params.svolume_margin)
    r = params.hrad
    spread = r * (np.abs(np.asarray(sx)) + np.abs(np.asarray(sy)))
    s0 = np.asarray(s0)
    return (s0 - spread >= s_lo) & (s0 + spread <= s_hi)


def test_svolume_matches_direct_cost_dense(scene_setup):
    scene, cams, params, imgs, view_ids, stats, vol = scene_setup
    n, d = _random_plane_field(jax.random.PRNGKey(7), cams, scene,
                               (48, 64))
    mv_direct = ncc.multiview_cost(imgs, view_ids, cams, n, d, stats,
                                   params)
    ids = jnp.asarray(view_ids, jnp.int32)
    mv_vol = sv.multiview_cost_svolume(vol, ids, jnp.ones((3,), bool),
                                       n, d, stats, params)
    c_d = np.asarray(mv_direct.cost)
    c_v = np.asarray(mv_vol.cost)
    # Interior only: window reach (5) + bilinear margin; and windows
    # whose implied depths stay inside the scene range (elsewhere the
    # volume clamps — the documented divergence).
    interior = np.zeros_like(c_d, bool)
    interior[6:-6, 6:-6] = True
    sel = interior & _inbounds_mask(scene, n, d, stats, params)
    assert sel.mean() > 0.4  # the comparison covers a substantial set
    delta = np.abs(c_d - c_v)[sel]
    assert np.median(delta) < 5e-3
    assert np.quantile(delta, 0.95) < 3e-2
    # Valid/invalid agreement on the comparable set.
    assert ((c_d == 2.0) == (c_v == 2.0))[sel].mean() > 0.99


def test_svolume_matches_direct_cost_packed(scene_setup):
    scene, cams, params, imgs, view_ids, stats, vol = scene_setup
    n, d = _random_plane_field(jax.random.PRNGKey(3), cams, scene,
                               (48, 64))
    ids = jnp.asarray(view_ids, jnp.int32)
    inb = _inbounds_mask(scene, n, d, stats, params)
    for parity in (0, 1):
        stats_p = ncc.compress_stats(stats, parity)
        coords = cb.parity_coords(48, 64, parity)
        n_p = cb.parity_compress_vec(n, parity)
        d_p = cb.parity_compress(d, parity)
        mv_direct = ncc.multiview_cost(imgs, view_ids, cams, n_p, d_p,
                                       stats_p, params, coords=coords)
        mv_vol = sv.multiview_cost_svolume(vol, ids,
                                           jnp.ones((3,), bool),
                                           n_p, d_p, stats_p, params,
                                           parity=parity)
        c_d = np.asarray(mv_direct.cost)
        c_v = np.asarray(mv_vol.cost)
        sel = np.zeros_like(c_d, bool)
        sel[6:-6, 4:-4] = True
        sel &= cb.parity_compress(jnp.asarray(inb), parity)
        delta = np.abs(c_d - c_v)[sel]
        assert np.median(delta) < 5e-3
        assert np.quantile(delta, 0.95) < 3e-2


def test_svolume_candidate_decisions_agree(scene_setup):
    """Batched candidate axis: argmin over 4 random candidate planes
    picks the same winner under both samplers almost everywhere."""
    scene, cams, params, imgs, view_ids, stats, vol = scene_setup
    keys = jax.random.split(jax.random.PRNGKey(11), 4)
    ns, ds = zip(*[_random_plane_field(k, cams, scene, (48, 64))
                   for k in keys])
    n = jnp.stack(ns)
    d = jnp.stack(ds)
    mv_direct = ncc.multiview_cost(imgs, view_ids, cams, n, d, stats,
                                   params)
    ids = jnp.asarray(view_ids, jnp.int32)
    mv_vol = sv.multiview_cost_svolume(vol, ids, jnp.ones((3,), bool),
                                       n, d, stats, params)
    am_d = np.asarray(jnp.argmin(mv_direct.cost, axis=0))[6:-6, 6:-6]
    am_v = np.asarray(jnp.argmin(mv_vol.cost, axis=0))[6:-6, 6:-6]
    assert (am_d == am_v).mean() > 0.9


def test_patchmatch_svolume_end_to_end_accuracy():
    """The real acceptance test: full PatchMatch with the s-volume
    sampler converges to the same depth quality as the direct sampler
    (the per-cost clamp divergences must not change outcomes)."""
    from tsar_mvs_tpu.models import patchmatch as pm
    import dataclasses

    scene = make_scene(height=64, width=96, num_views=4, seed=5)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    base = AlgorithmParams(iterations=6).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = (1, 2, 3)
    key = jax.random.PRNGKey(0)

    accs = {}
    for impl in ("direct", "svolume"):
        params = dataclasses.replace(base, ncc_impl=impl)
        state = pm.run_patchmatch(key, imgs, view_ids, cams, params,
                                  iterations=6)
        xx = jnp.arange(96, dtype=jnp.float32)[None, :]
        yy = jnp.arange(64, dtype=jnp.float32)[:, None]
        depth = np.asarray(geo.depth_from_plane(cams, state.normal,
                                                state.d, xx, yy))
        gt = scene.depth[0]
        ok = np.isfinite(gt) & ~scene.weak_mask[0]
        ok[:6] = ok[-6:] = False
        ok[:, :6] = ok[:, -6:] = False
        rel = np.abs(depth - gt) / np.where(np.isfinite(gt), gt, 1.0)
        accs[impl] = (rel[ok] < 0.02).mean()

    assert accs["svolume"] > accs["direct"] - 0.05, accs
    assert accs["svolume"] > 0.5, accs


def test_plane_counts_monotone_and_budgeted():
    A = np.eye(3)[None]
    b = np.array([[100.0, 0.0, 0.0]])
    s_lo, s_hi = -1.0, -0.25
    S1 = sv.plane_counts(A, b, 64, 64, s_lo, s_hi, step_px=1.0)[0]
    S2 = sv.plane_counts(A, b, 64, 64, s_lo, s_hi, step_px=2.0)[0]
    assert S1 > S2 >= 2
    # pure-translation warp: motion = |b_xy| * (s_hi - s_lo) = 75 px
    assert abs(S1 - 76) <= 2
    # memory budget coarsens the spacing
    Sb = sv.plane_counts(A, b, 64, 64, s_lo, s_hi, step_px=1.0,
                         budget_bytes=64 * 64 * 2 * 20)[0]
    assert Sb <= 21
