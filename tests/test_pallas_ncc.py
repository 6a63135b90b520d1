"""Oracle tests for the Pallas s-volume NCC kernel (ops/pallas_ncc.py)
in interpret mode: the kernel's data-dependent slab walk must reproduce
the XLA s-volume sweep (ops/svolume.py) to accumulation-order noise —
both center samples before accumulating, but the kernel expands src^2
incrementally (partial-square trick) so f32 rounding differs slightly.

That noise can flip the knife-edge `var_src < min_var` comparison at
flat (textureless) pixels, where both paths report cost ~1.0 (NCC = 0)
or cost_max — equally poor, decision-irrelevant. The comparisons below
therefore exclude pixels where either path is ~saturated (cost >= 0.99)
and separately bound the flip rate.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops import ncc
from tsar_mvs_tpu.ops import pallas_ncc as pn
from tsar_mvs_tpu.ops import svolume as sv
from tsar_mvs_tpu.utils.synthetic import make_scene


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("TSAR_PALLAS_INTERPRET", "1")


H, W = 64, 256  # packed (64, 128): exactly one kernel tile

def _assert_cost_agreement(delta, sharp):
    """Quantile-based agreement: NCC divides by sqrt(var_src), so the
    ~3e-4 accumulation-order noise is amplified without bound as
    var_src -> 0 (and flips the low_var threshold at exactly-flat
    pixels). The engine consumes costs only through comparisons, so the
    spec is: overwhelmingly tight agreement + a bounded tail."""
    d = delta[sharp]
    assert np.quantile(d, 0.5) < 5e-4, float(np.quantile(d, 0.5))
    assert np.quantile(d, 0.99) < 5e-3, float(np.quantile(d, 0.99))
    assert (delta > 0.1).mean() < 0.01, float((delta > 0.1).mean())




@pytest.fixture(scope="module")
def setup():
    scene = make_scene(height=H, width=W, num_views=3, seed=2)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = (1, 2)
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)
    idx = jnp.asarray(view_ids, jnp.int32)
    s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max,
                                       params.svolume_margin)
    counts = sv.plane_counts(np.asarray(cams.A[idx]),
                             np.asarray(cams.b[idx]), H, W, s_lo, s_hi)
    vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx],
                           s_lo, s_hi, counts)
    vols_p = pn.prepare_parity_volumes(vol.data, H, W)
    return scene, cams, params, view_ids, stats, vol, counts, s_lo, vols_p


def _plane_field(key, cams, scene, shape):
    k1, k2 = jax.random.split(key)
    n = geo.normalize(jax.random.normal(k1, shape + (3,)))
    vv = geo.view_vectors(cams, *shape)
    n = geo.hemisphere_flip(n, vv)
    depth = jax.random.uniform(k2, shape, jnp.float32,
                               scene.depth_min * 1.05,
                               scene.depth_max * 0.95)
    rays = geo.pixel_rays(cams, *shape)
    d = geo.plane_d_from_depth(n, rays, depth)
    return n, d


@pytest.mark.parametrize("parity", [0, 1])
def test_pallas_matches_svolume_packed(setup, parity):
    scene, cams, params, view_ids, stats, vol, counts, s_lo, vols_p = setup
    n, d = _plane_field(jax.random.PRNGKey(4), cams, scene, (H, W))
    ids = jnp.asarray(view_ids, jnp.int32)
    valid = jnp.ones((len(view_ids),), bool)
    stats_p = ncc.compress_stats(stats, parity)
    n_p = cb.parity_compress_vec(n, parity)
    d_p = cb.parity_compress(d, parity)

    mv_ref = sv.multiview_cost_svolume(vol, ids, valid, n_p, d_p,
                                       stats_p, params, parity=parity)
    mv_pal = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo,
                                      vol.inv_ds, ids, valid, n_p, d_p,
                                      stats_p, params, parity)
    c_ref = np.asarray(mv_ref.cost)
    c_pal = np.asarray(mv_pal.cost)
    assert c_pal.shape == c_ref.shape
    delta = np.abs(c_ref - c_pal)
    sharp = np.minimum(c_ref, c_pal) < 0.99
    assert sharp.mean() > 0.3
    _assert_cost_agreement(delta, sharp)
    assert (np.asarray(mv_ref.best_view)
            == np.asarray(mv_pal.best_view))[sharp].mean() > 0.995


def test_pallas_candidate_batch(setup):
    """The kernel's in-kernel candidate axis: a (C, Hc, Wc) batched field
    returns per-candidate costs matching the XLA sweep, and the argmin
    decisions agree."""
    scene, cams, params, view_ids, stats, vol, counts, s_lo, vols_p = setup
    parity = 0
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    ns, ds = zip(*[_plane_field(k, cams, scene, (H, W)) for k in keys])
    n_p = jnp.stack([cb.parity_compress_vec(n, parity) for n in ns])
    d_p = jnp.stack([cb.parity_compress(d, parity) for d in ds])
    ids = jnp.asarray(view_ids, jnp.int32)
    valid = jnp.ones((len(view_ids),), bool)
    stats_p = ncc.compress_stats(stats, parity)

    mv_ref = sv.multiview_cost_svolume(vol, ids, valid, n_p, d_p,
                                       stats_p, params, parity=parity)
    mv_pal = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo,
                                      vol.inv_ds, ids, valid, n_p, d_p,
                                      stats_p, params, parity)
    c_ref = np.asarray(mv_ref.cost)
    c_pal = np.asarray(mv_pal.cost)
    delta = np.abs(c_ref - c_pal)
    sharp = np.minimum(c_ref, c_pal) < 0.99
    _assert_cost_agreement(delta, sharp)
    am_ref = np.asarray(jnp.argmin(mv_ref.cost, axis=0))
    am_pal = np.asarray(jnp.argmin(mv_pal.cost, axis=0))
    assert (am_ref == am_pal).mean() > 0.99


def test_pallas_multi_tile(setup):
    """Grid > 1x1: a 128x512 image (packed 128x256 -> 2x2 tiles) runs the
    tiled kernel and matches the sweep on every tile."""
    scene = make_scene(height=128, width=512, num_views=3, seed=3)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    view_ids = (1, 2)
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)
    idx = jnp.asarray(view_ids, jnp.int32)
    s_lo, s_hi = sv.s_range_for_depths(scene.depth_min, scene.depth_max,
                                       params.svolume_margin)
    counts = sv.plane_counts(np.asarray(cams.A[idx]),
                             np.asarray(cams.b[idx]), 128, 512, s_lo, s_hi)
    vol = sv.build_svolume(imgs[idx], cams.A[idx], cams.b[idx],
                           s_lo, s_hi, counts)
    vols_p = pn.prepare_parity_volumes(vol.data, 128, 512)

    parity = 1
    n, d = _plane_field(jax.random.PRNGKey(6), cams, scene, (128, 512))
    stats_p = ncc.compress_stats(stats, parity)
    n_p = cb.parity_compress_vec(n, parity)
    d_p = cb.parity_compress(d, parity)
    ids = jnp.asarray(view_ids, jnp.int32)
    valid = jnp.ones((2,), bool)
    mv_ref = sv.multiview_cost_svolume(vol, ids, valid, n_p, d_p,
                                       stats_p, params, parity=parity)
    mv_pal = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo,
                                      vol.inv_ds, ids, valid, n_p, d_p,
                                      stats_p, params, parity)
    c_ref = np.asarray(mv_ref.cost)
    c_pal = np.asarray(mv_pal.cost)
    delta = np.abs(c_ref - c_pal)
    sharp = np.minimum(c_ref, c_pal) < 0.99
    _assert_cost_agreement(delta, sharp)


def test_pallas_narrow_bracket_converged_field(setup):
    """A smooth converged-like field (GT depth + near-frontal normals)
    produces NARROW per-tile s-brackets — the regime the kernel's
    data-dependent window walk actually optimizes (random fields cover
    the whole range and never exercise bracket-edge handling)."""
    scene, cams, params, view_ids, stats, vol, counts, s_lo, vols_p = setup
    gt = np.where(np.isfinite(scene.depth[0]), scene.depth[0],
                  0.5 * (scene.depth_min + scene.depth_max))
    depth = jnp.asarray(gt, jnp.float32)
    vv = geo.view_vectors(cams, H, W)
    n = geo.hemisphere_flip(geo.normalize(jnp.asarray(
        np.stack([np.full((H, W), 0.05), np.full((H, W), 0.03),
                  np.ones((H, W))], -1), jnp.float32)), vv)
    rays = geo.pixel_rays(cams, H, W)
    d = geo.plane_d_from_depth(n, rays, depth)
    ids = jnp.asarray(view_ids, jnp.int32)
    valid = jnp.ones((len(view_ids),), bool)
    for parity in (0, 1):
        stats_p = ncc.compress_stats(stats, parity)
        n_p = cb.parity_compress_vec(n, parity)
        d_p = cb.parity_compress(d, parity)
        mv_ref = sv.multiview_cost_svolume(vol, ids, valid, n_p, d_p,
                                           stats_p, params, parity=parity)
        mv_pal = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo,
                                          vol.inv_ds, ids, valid, n_p,
                                          d_p, stats_p, params, parity)
        c_ref = np.asarray(mv_ref.cost)
        c_pal = np.asarray(mv_pal.cost)
        delta = np.abs(c_ref - c_pal)
        sharp = np.minimum(c_ref, c_pal) < 0.99
        assert sharp.mean() > 0.5
        _assert_cost_agreement(delta, sharp)


def test_invalid_candidate_does_not_poison_block(setup):
    """Border banks pad invalid candidates with d = 0 (checkerboard.
    select_candidates) -> inf/NaN plane scalars. In a CBLK candidate
    block, one NaN pixel must not poison the co-resident candidate's
    bracket: its costs must equal its solo evaluation. (This was a real
    3-point acc<2% regression: the NaN emptied the whole tile's walk
    for BOTH candidates of the pair.)"""
    scene, cams, params, view_ids, stats, vol, counts, s_lo, vols_p = setup
    parity = 0
    n, d = _plane_field(jax.random.PRNGKey(12), cams, scene, (H, W))
    stats_p = ncc.compress_stats(stats, parity)
    n_p = cb.parity_compress_vec(n, parity)
    d_p = cb.parity_compress(d, parity)
    ids = jnp.asarray(view_ids, jnp.int32)
    valid = jnp.ones((len(view_ids),), bool)

    solo = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo,
                                    vol.inv_ds, ids, valid, n_p[None],
                                    d_p[None], stats_p, params, parity)
    # Pair with an all-invalid candidate (d = 0 like the bank padding).
    n2 = jnp.stack([n_p, n_p])
    d2 = jnp.stack([d_p, jnp.zeros_like(d_p)])
    paired = pn.multiview_cost_pallas(vols_p[parity], counts, s_lo,
                                      vol.inv_ds, ids, valid, n2, d2,
                                      stats_p, params, parity)
    np.testing.assert_allclose(np.asarray(paired.cost[0]),
                               np.asarray(solo.cost[0]), atol=1e-5)
