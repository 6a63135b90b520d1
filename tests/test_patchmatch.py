"""End-to-end PatchMatch convergence on the synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.models import patchmatch as pm
from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops import ncc


def test_candidate_banks_match_reference_offsets():
    """Bank tables mirror gipuma.cu:874-1042 (sans the two reference
    bugs documented in ops/checkerboard.py)."""
    up_far, down_far, left_far, right_far = cb.BANKS[:4]
    assert up_far[0] == (0, -3) and up_far[-1] == (0, -23)
    assert down_far[5] == (0, 13)
    assert left_far[2] == (-7, 0)
    assert right_far[0] == (3, 0)
    up_near, down_near, left_near, right_near = cb.BANKS[4:]
    assert set(up_near) == {(0, -1), (0, -2), (-1, -3), (1, -3), (-2, -4),
                            (2, -4)}
    assert set(left_near) == {(-1, 0), (-2, 0), (-3, -1), (-3, 1), (-4, -2),
                              (-4, 2)}


def test_select_candidates_picks_min_stored_cost(rng):
    H, W = 32, 32
    cost = jnp.asarray(rng.uniform(0.5, 2.0, (H, W)), jnp.float32)
    normal = jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)
    d = jnp.asarray(rng.uniform(1, 2, (H, W)), jnp.float32)
    cands = pm.cb.select_candidates(normal, d, cost)
    # Oracle for the up_far bank at an interior pixel.
    y, x = 25, 16
    offs = cb.BANKS[0]
    cs = [float(cost[y + dy, x + dx]) for (dx, dy) in offs
          if 0 <= y + dy < H and 0 <= x + dx < W]
    pts = [(y + dy, x + dx) for (dx, dy) in offs
           if 0 <= y + dy < H and 0 <= x + dx < W]
    by, bx = pts[int(np.argmin(cs))]
    np.testing.assert_allclose(np.asarray(cands.d)[0, y, x],
                               float(d[by, bx]))
    assert bool(cands.valid[0, y, x])
    # Near the top border the up_far bank has no sample.
    assert not bool(cands.valid[0, 1, x])


def test_parity_mask():
    m0 = np.asarray(cb.parity_mask(4, 4, 0))
    assert m0[0, 0] and not m0[0, 1] and m0[1, 1]
    m1 = np.asarray(cb.parity_mask(4, 4, 1))
    assert not (m0 & m1).any() and (m0 | m1).all()


@pytest.mark.slow
def test_patchmatch_converges_on_synthetic_scene(scene):
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(iterations=6).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    key = jax.random.PRNGKey(0)
    state = pm.run_patchmatch(key, imgs, (1, 2, 3, 4), cams, params)
    depth = np.asarray(pm.depth_map(state, cams))

    gt = scene.depth[0]
    ok = np.isfinite(gt) & ~scene.weak_mask[0]
    interior = np.zeros_like(ok)
    interior[8:-8, 8:-8] = ok[8:-8, 8:-8]
    rel_err = np.abs(depth - gt) / gt
    # Textured interior: most pixels should land within 2% of GT depth.
    frac_good = (rel_err[interior] < 0.02).mean()
    # Raw PatchMatch leaves occlusion/weak-window outliers by design —
    # the TSAR refinement stages exist to clean those up.
    assert frac_good > 0.8, frac_good
    assert np.median(rel_err[interior]) < 0.005
    # Costs should be low where converged.
    assert np.median(np.asarray(state.cost)[interior]) < 0.2


@pytest.mark.slow
def test_blocked_refinement_accuracy_parity(scene):
    """Tile-blocked coarse refinement draws (config.refine_block_frac,
    the Pallas-kernel bracket-narrowing scheme) must not cost converged
    accuracy vs pure per-pixel draws: the per-pixel marginal is uniform
    either way, only intra-tile correlation differs (ADVICE r3)."""
    import dataclasses
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(iterations=4).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    gt = scene.depth[0]
    ok = np.isfinite(gt) & ~scene.weak_mask[0]
    interior = np.zeros_like(ok)
    interior[8:-8, 8:-8] = ok[8:-8, 8:-8]

    med = {}
    for blocked in (False, True):
        p = (params if blocked
             else dataclasses.replace(params, refine_block_frac=0.0))
        state = pm._run_patchmatch_jit(
            jax.random.PRNGKey(0), imgs, (1, 2, 3, 4), cams, p,
            iterations=4, svol_planes=None, use_pallas=False)
        # Re-run the step loop with the blocked flag forced on the
        # direct path (run_patchmatch only engages it on the kernel
        # path; the draw scheme itself is sampler-independent).
        stats = ncc.precompute_ref_stats(imgs[0], cams, p)

        def eval_view_cost(normal, d, st, coords, parity=None):
            return ncc.multiview_cost(imgs, (1, 2, 3, 4), cams, normal,
                                      d, st, p, coords=coords)

        cost_fn, pctx = pm._make_cost_and_ctx(stats, cams, *imgs.shape[1:],
                                              eval_view_cost)
        init = pm.random_init_with(jax.random.PRNGKey(1), imgs.shape[1:],
                                   cams, stats.rays, cost_fn, p)
        step = pm.make_patchmatch_step(cost_fn, stats.rays, cams, p,
                                       pctx=pctx, blocked_refine=blocked)
        state, _ = jax.lax.fori_loop(0, 4, step,
                                     (init, jax.random.PRNGKey(2)))
        depth = np.asarray(pm.depth_map(state, cams))
        rel = np.abs(depth - gt) / gt
        med[blocked] = float(np.median(rel[interior]))
    # Blocked draws must stay within 2x the per-pixel baseline's median
    # error (both well-converged on the synthetic scene).
    assert med[True] < max(2.0 * med[False], 0.01), med


def test_viewscan_branch_matches_default(scene, monkeypatch):
    """The large-image viewscan branch (one view's working set live at a
    time; VIEWSCAN_MIN_PIXELS) computes the same result as the unrolled
    direct path — forced at small size by lowering the threshold."""
    import dataclasses
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = dataclasses.replace(
        AlgorithmParams(iterations=2),
        ncc_impl="direct").with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)

    state_unrolled = pm.run_patchmatch(jax.random.PRNGKey(5), imgs,
                                       (1, 2, 3), cams, params)
    monkeypatch.setattr(pm, "VIEWSCAN_MIN_PIXELS", 1)
    state_scan = pm.run_patchmatch(jax.random.PRNGKey(5), imgs,
                                   (1, 2, 3), cams, params)
    # Same RNG stream + same cost values => identical accept decisions.
    np.testing.assert_allclose(np.asarray(state_scan.d),
                               np.asarray(state_unrolled.d), rtol=1e-5,
                               atol=1e-5)
    assert (np.asarray(state_scan.best_view)
            == np.asarray(state_unrolled.best_view)).mean() > 0.999


def test_iteration_schedule_policy():
    """config.iterations_fine drives lifted-level iteration counts:
    coarsest level keeps the full count; fine levels run
    min(iterations, iterations_fine); 0 disables (all levels equal)."""
    p = AlgorithmParams(iterations=8, iterations_fine=3)
    assert pm.iteration_schedule(p, 3) == (8, 3, 3)
    p0 = AlgorithmParams(iterations=8, iterations_fine=0)
    assert pm.iteration_schedule(p0, 2) == (8, 8)
    # Small explicit iteration requests are never inflated.
    p1 = AlgorithmParams(iterations=1, iterations_fine=3)
    assert pm.iteration_schedule(p1, 3) == (1, 1, 1)


def test_prop_banks_near_only_subset(scene):
    """prop_banks=4 restricts propagation to the near banks (the END of
    cb.BANKS) and still converges on the synthetic scene when seeded
    with a coarse prior (the config.prop_banks_fine fast path)."""
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(
        iterations=4, prop_banks_fine=4).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    state = pm.run_patchmatch_pyramid(
        jax.random.PRNGKey(0), imgs, (1, 2, 3, 4), list(scene.P), params,
        levels=(2, 1), depth_min=scene.depth_min,
        depth_max=scene.depth_max)
    depth = np.asarray(pm.depth_map(state, cams))
    gt = scene.depth[0]
    ok = np.isfinite(gt) & ~scene.weak_mask[0]
    interior = np.zeros_like(ok)
    interior[8:-8, 8:-8] = ok[8:-8, 8:-8]
    rel_err = np.abs(depth - gt) / gt
    assert (rel_err[interior] < 0.02).mean() > 0.75, \
        (rel_err[interior] < 0.02).mean()
