"""source_coverage: the observability mask behind the bench's engine
accuracy metric (the rounds-1/2 "0.723 plateau" was unobservable pixels,
not matcher error — see synthetic.source_coverage docstring)."""

import numpy as np

from tsar_mvs_tpu.utils.synthetic import make_scene, source_coverage


def test_coverage_counts_bounded(scene):
    cover = source_coverage(scene, ref=0)
    assert cover.shape == scene.depth.shape[1:]
    assert cover.min() >= 0
    assert cover.max() <= scene.num_views - 1


def test_center_pixels_fully_covered(scene):
    """The arc looks at the scene center: central textured pixels are
    observable in every source view."""
    H, W = scene.depth.shape[1:]
    cover = source_coverage(scene, ref=0)
    core = cover[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4]
    assert (core == scene.num_views - 1).all()


def test_unobservable_fraction_is_the_plateau():
    """At the bench geometry a material fraction of textured ref pixels
    reprojects outside every source frame — the acc ceiling."""
    scene = make_scene(height=96, width=128, num_views=4, seed=0)
    cover = source_coverage(scene, ref=0)
    ok = np.isfinite(scene.depth[0]) & ~scene.weak_mask[0]
    frac0 = (cover[ok] == 0).mean()
    assert 0.05 < frac0 < 0.35


def test_respects_src_view_subset(scene):
    cover_all = source_coverage(scene, ref=0)
    cover_one = source_coverage(scene, ref=0, src_views=[1])
    assert cover_one.max() <= 1
    assert (cover_one <= cover_all).all()
