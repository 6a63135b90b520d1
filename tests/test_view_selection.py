"""Legacy angle-based view selection (selectViews, main.cpp:1011-1096)."""

import numpy as np

from tsar_mvs_tpu.models import view_selection as vs


def _look_at_P(center, yaw_deg):
    """Camera at `center` yawed about y, K = I-ish intrinsics."""
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    a = np.radians(yaw_deg)
    R = np.array([[np.cos(a), 0, -np.sin(a)],
                  [0, 1, 0],
                  [np.sin(a), 0, np.cos(a)]])
    t = -R @ np.asarray(center, float)
    return K @ np.hstack([R, t[:, None]])


def test_principal_axis_points_into_scene():
    P = _look_at_P([0, 0, 0], 0.0)
    ax = vs.principal_axis(P)
    assert np.allclose(ax, [0, 0, 1], atol=1e-9)


def test_angle_window_filters_views():
    # Ref at origin looking +z; candidates on a circle with increasing
    # baselines -> increasing triangulation angle at depth 10.
    depth = 10.0
    P = [_look_at_P([0, 0, 0], 0.0)]
    offsets = [0.2, 1.0, 3.0, 12.0]       # -> ~1.1, 5.7, 16.7, 50 deg
    for dx in offsets:
        P.append(_look_at_P([dx, 0, 0], 0.0))
    ang = vs.triangulation_angles(P, 0, depth)
    expect = [np.degrees(np.arctan2(dx, depth)) for dx in offsets]
    assert np.allclose(ang[1:], expect, atol=0.5)

    sel = vs.select_views_angle(P, 0, depth, depth, min_angle=5.0,
                                max_angle=45.0)
    assert sel == [2, 3]


def test_max_views_downsample_deterministic():
    depth = 10.0
    P = [_look_at_P([0, 0, 0], 0.0)]
    for dx in np.linspace(1.0, 8.0, 10):
        P.append(_look_at_P([dx, 0, 0], 0.0))
    a = vs.select_views_angle(P, 0, depth, depth, min_angle=1.0,
                              max_angle=60.0, max_views=4, seed=7)
    b = vs.select_views_angle(P, 0, depth, depth, min_angle=1.0,
                              max_angle=60.0, max_views=4, seed=7)
    assert a == b
    assert len(a) == 4
