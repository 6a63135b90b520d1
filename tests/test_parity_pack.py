"""Parity half-grid compression (ops.checkerboard) and packed bilinear
sampling (ops.sampling) — the hot-path layout transforms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsar_mvs_tpu.ops import checkerboard as cb
from tsar_mvs_tpu.ops import sampling


@pytest.mark.parametrize("parity", [0, 1])
def test_parity_roundtrip(parity, rng):
    H, W = 6, 8
    a = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    comp = cb.parity_compress(a, parity)
    assert comp.shape == (H, W // 2)
    old = jnp.zeros_like(a)
    full = cb.parity_expand(comp, old, parity)
    mask = np.asarray(cb.parity_mask(H, W, parity))
    np.testing.assert_array_equal(np.asarray(full)[mask],
                                  np.asarray(a)[mask])
    np.testing.assert_array_equal(np.asarray(full)[~mask], 0.0)


@pytest.mark.parametrize("parity", [0, 1])
def test_parity_coords_match_compress(parity):
    H, W = 6, 8
    yy_full, xx_full = np.mgrid[0:H, 0:W].astype(np.float32)
    xx_c, yy_c = cb.parity_coords(H, W, parity)
    np.testing.assert_array_equal(
        np.asarray(cb.parity_compress(jnp.asarray(xx_full), parity)),
        np.asarray(xx_c))
    np.testing.assert_array_equal(
        np.asarray(cb.parity_compress(jnp.asarray(yy_full), parity)),
        np.asarray(yy_c))
    # Every packed coordinate really is in the parity class.
    assert (((np.asarray(xx_c) + np.asarray(yy_c)) % 2)
            == parity).all()


def test_parity_compress_vec_channels():
    H, W = 4, 6
    a = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H, W, 3)
    c = cb.parity_compress_vec(a, 0)
    assert c.shape == (H, W // 2, 3)
    ref = jnp.stack([cb.parity_compress(a[..., k], 0) for k in range(3)],
                    axis=-1)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(ref))


def test_packed_bilinear_matches_dense(rng):
    H, W = 17, 23
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-2, W + 2, size=(50,)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-2, H + 2, size=(50,)).astype(np.float32))
    dense = sampling.bilinear_sample(img, x, y)
    packed = sampling.bilinear_sample_packed(sampling.pack_image(img),
                                             x, y)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(packed),
                               rtol=1e-6, atol=1e-6)


def test_compressed_cost_equals_dense_at_parity_pixels(rng):
    """pm_cost with compressed stats + packed coords must reproduce the
    dense cost at exactly the parity pixels."""
    from tsar_mvs_tpu import geometry as geo
    from tsar_mvs_tpu.config import AlgorithmParams
    from tsar_mvs_tpu.ops import ncc
    from tsar_mvs_tpu.utils.synthetic import make_scene

    scene = make_scene(height=32, width=48, num_views=3, seed=3)
    cams = geo.build_camera_set(list(scene.P),
                                depth_min=scene.depth_min,
                                depth_max=scene.depth_max)
    params = AlgorithmParams(box_hsize=5, box_vsize=5).with_depth_range(
        scene.depth_min, scene.depth_max, float(cams.f))
    imgs = jnp.asarray(scene.images, jnp.float32)
    stats = ncc.precompute_ref_stats(imgs[0], cams, params)

    H, W = 32, 48
    key = jax.random.PRNGKey(0)
    n = geo.normalize(jax.random.normal(key, (H, W, 3)))
    n = geo.hemisphere_flip(n, geo.view_vectors(cams, H, W))
    depth = jnp.full((H, W), 0.5 * (scene.depth_min + scene.depth_max))
    d = geo.plane_d_from_depth(n, stats.rays, depth)

    dense = ncc.multiview_cost(imgs, (1, 2), cams, n, d, stats, params)

    for parity in (0, 1):
        st_c = ncc.compress_stats(stats, parity)
        coords = cb.parity_coords(H, W, parity)
        n_c = cb.parity_compress_vec(n, parity)
        d_c = cb.parity_compress(d, parity)
        comp = ncc.multiview_cost(imgs, (1, 2), cams, n_c, d_c, st_c,
                                  params, coords=coords)
        np.testing.assert_allclose(
            np.asarray(comp.cost),
            np.asarray(cb.parity_compress(dense.cost, parity)),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(comp.best_view),
            np.asarray(cb.parity_compress(dense.best_view, parity)))
