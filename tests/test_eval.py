"""GT evaluation harness (reference groundTruthUtils.h:22-139) and the
display utilities (displayUtils.h:34-76, main.cpp:1321-1341)."""

import numpy as np

from tsar_mvs_tpu import eval as ev
from tsar_mvs_tpu.utils import display


def test_depth_error_rates():
    gt = np.full((10, 10), 5.0)
    gt[0, 0] = 0.0                       # no GT here
    est = gt.copy()
    est[1, :5] = 8.0                     # 5 wrong pixels
    est[2, :4] = 0.0                     # 4 invalid pixels
    r = ev.depth_error(est, gt, tolerance=1.0)
    n_gt = 99
    assert r.num_gt == n_gt
    # Invalid estimates (disp 0 vs GT 5) are also wrong in the overall
    # rate: 5 mismatches + 4 invalid.
    assert np.isclose(r.error, 9 / n_gt)
    assert np.isclose(r.error_valid, 5 / (n_gt - 4))
    assert np.isclose(r.error_valid_all, (5 + 4) / n_gt)
    assert r.abs_err_mean > 0


def test_depth_error_occlusion_mask():
    gt = np.full((4, 4), 2.0)
    est = gt.copy()
    est[0, 0] = 9.0                      # wrong, occluded
    occl = np.zeros((4, 4), np.uint8)
    occl[0, 0] = 128
    r = ev.depth_error(est, gt, tolerance=0.5, occl_mask=occl)
    assert r.error > 0
    assert r.error_nocc == 0.0


def test_normal_error_angles():
    gt = np.zeros((2, 2, 3))
    gt[..., 2] = 1.0
    est = gt.copy()
    est[0, 0] = [1.0, 0.0, 0.0]          # 90 deg off
    r = ev.normal_error(est, gt)
    assert np.isclose(r.angle_err_deg[0, 0], 90.0, atol=1e-4)
    assert np.isclose(r.angle_err_deg[1, 1], 0.0, atol=1e-4)
    assert 0 < r.mean_deg < 90
    # Sign-invariant (normals are hemisphere-ambiguous).
    r2 = ev.normal_error(-est, gt)
    assert np.isclose(r2.mean_deg, r.mean_deg)


def test_point_cloud_fscore_identity_and_offset():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(500, 3))
    r = ev.point_cloud_fscore(pts, pts, threshold=0.02)
    assert r.f1 == 1.0
    far = pts + 10.0
    r2 = ev.point_cloud_fscore(far, pts, threshold=0.02)
    assert r2.f1 == 0.0


def test_normals_for_display_coding():
    n = np.zeros((3, 1, 3), np.float32)
    n[0, 0] = [0, 0, -1]                 # camera-facing
    n[1, 0] = [1, 0, 0]
    rgb = display.normals_for_display(n)
    assert rgb[0, 0, 2] == 0             # -z -> B channel 0
    assert rgb[1, 0, 0] == 255           # +x -> R channel 255
    assert (rgb[2, 0] == 0).all()        # zero normal -> black


def test_sphere_legend_and_stamp():
    leg = display.sphere_legend(32)
    assert leg.shape == (32, 32, 3)
    img = np.zeros((64, 64, 3), np.uint8)
    out = display.add_sphere_legend(img, 32)
    assert (out[-32:, -32:] == leg).all()
    assert (out[:32, :32] == 0).all()


def test_disparity_for_display_range():
    d = np.zeros((4, 4))
    d[1, 1] = 2.0
    d[2, 2] = 4.0
    img = display.disparity_for_display(d)
    assert img[0, 0] == 0                # invalid -> black
    assert img[2, 2] == 255
    assert 0 < img[1, 1] < 255 or img[1, 1] == 0  # min maps to 0


def test_write_parameters_file(tmp_path):
    from tsar_mvs_tpu.config import AlgorithmParams
    p = tmp_path / "params.txt"
    display.write_parameters_file(p, AlgorithmParams(), {"extra": 7})
    text = p.read_text()
    assert "box_hsize = 11" in text
    assert "extra = 7" in text
