"""Oracle tests for the color (float4-intent) NCC path (ops/ncc_color).

Identity oracle: with all three channels equal, the L1 bilateral color
distance triples (|d|+|d|+|d|), so the color cost equals the grayscale
cost evaluated with sigma_color' = sigma_color/sqrt(3); the channel
samples are identical so every NCC moment matches exactly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams
from tsar_mvs_tpu.ops import ncc, ncc_color as nc
from tsar_mvs_tpu.ops.sampling import pack_image
from tsar_mvs_tpu.utils.synthetic import make_scene


def _plane_field(key, cams, scene, shape):
    k1, k2 = jax.random.split(key)
    n = geo.normalize(jax.random.normal(k1, shape + (3,)))
    n = geo.hemisphere_flip(n, geo.view_vectors(cams, *shape))
    depth = jax.random.uniform(k2, shape, jnp.float32,
                               scene.depth_min * 1.05,
                               scene.depth_max * 0.95)
    d = geo.plane_d_from_depth(n, geo.pixel_rays(cams, *shape), depth)
    return n, d


def test_equal_channels_match_grayscale():
    H, W = 48, 64
    scene = make_scene(height=H, width=W, num_views=3, seed=1)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    rgb = jnp.repeat(imgs[:, None], 3, axis=1)          # (V, 3, H, W)

    n, d = _plane_field(jax.random.PRNGKey(3), cams, scene, (H, W))

    stats_c = nc.precompute_ref_stats_color(rgb[0], cams, params)
    cost_c = nc.pm_cost_ab_color(nc.pack_image_color(rgb[1]), cams.A[1],
                                 cams.b[1], n, d, stats_c, params)

    params_g = AlgorithmParams(
        sigma_color=params.sigma_color / math.sqrt(3.0)).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    stats_g = ncc.precompute_ref_stats(imgs[0], cams, params_g)
    cost_g = ncc.pm_cost_ab(pack_image(imgs[1], jnp.bfloat16), cams.A[1],
                            cams.b[1], n, d, stats_g, params_g)

    np.testing.assert_allclose(np.asarray(cost_c), np.asarray(cost_g),
                               atol=2e-3)


def test_color_patchmatch_converges():
    from tsar_mvs_tpu.models import patchmatch as pm
    import dataclasses
    H, W = 48, 64
    scene = make_scene(height=H, width=W, num_views=4, seed=0)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = dataclasses.replace(
        AlgorithmParams(iterations=3),
        color_processing=True).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    rgb = jnp.repeat(imgs[:, None], 3, axis=1)
    state = pm.run_patchmatch(jax.random.PRNGKey(0), imgs, (1, 2, 3),
                              cams, params, imgs_color=rgb)
    depth = np.asarray(pm.depth_map(state, cams))
    gt = scene.depth[0]
    ok = np.isfinite(gt)
    interior = np.zeros_like(ok)
    interior[6:-6, 6:-6] = ok[6:-6, 6:-6]
    rel = np.abs(depth - gt) / np.where(ok, gt, 1.0)
    assert np.median(rel[interior]) < 0.03


def test_color_viewscan_matches_unrolled():
    """multiview_cost_color_viewscan (lax.scan over views) must match
    the unrolled per-view aggregation."""
    H, W = 48, 64
    scene = make_scene(height=H, width=W, num_views=3, seed=2)
    cams = geo.build_camera_set(list(scene.P), depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams().with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    rgb = np.repeat(scene.images[:, None], 3, axis=1).astype(np.float32)
    rgb[:, 1] *= 0.8
    rgb[:, 2] *= 0.6
    rgb = jnp.asarray(rgb)
    view_ids = (1, 2)
    stats = nc.precompute_ref_stats_color(rgb[0], cams, params)
    packed = {v: nc.pack_image_color(rgb[v]) for v in view_ids}
    key = jax.random.PRNGKey(3)
    n = geo.normalize(jax.random.normal(key, (H, W, 3)))
    n = geo.hemisphere_flip(n, geo.view_vectors(cams, H, W))
    depth = jnp.full((H, W), 0.5 * (scene.depth_min + scene.depth_max))
    d = geo.plane_d_from_depth(n, geo.pixel_rays(cams, H, W), depth)
    mv_u = nc.multiview_cost_color(packed, view_ids, cams, n, d, stats,
                                   params)
    ids = jnp.asarray(view_ids, jnp.int32)
    stack = jnp.stack([jnp.stack([p.data for p in packed[v]])
                       for v in view_ids])
    mv_s = nc.multiview_cost_color_viewscan(
        stack, H, W, cams.A[ids], cams.b[ids], ids,
        jnp.ones((2,), bool), n, d, stats, params)
    np.testing.assert_allclose(np.asarray(mv_s.cost),
                               np.asarray(mv_u.cost), atol=1e-5)
    assert (np.asarray(mv_s.best_view)
            == np.asarray(mv_u.best_view)).mean() > 0.99
