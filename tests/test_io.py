"""Round-trip tests for the dmb/pfm/ply codecs and scene files."""

import numpy as np

from tsar_mvs_tpu.utils.dmb import read_dmb, write_dmb
from tsar_mvs_tpu.utils.pfm import read_pfm, write_pfm
from tsar_mvs_tpu.utils.ply import read_ply, write_ply
from tsar_mvs_tpu.utils.scene_io import (CamFile, PairFile, read_cam_file,
                                         read_pair_file, write_cam_file,
                                         write_pair_file)


def test_dmb_roundtrip_2d(tmp_path, rng):
    arr = rng.standard_normal((17, 23)).astype(np.float32)
    path = tmp_path / "depth.dmb"
    write_dmb(path, arr)
    out = read_dmb(path)
    np.testing.assert_array_equal(out, arr)


def test_dmb_roundtrip_3d(tmp_path, rng):
    arr = rng.standard_normal((9, 11, 3)).astype(np.float32)
    path = tmp_path / "normals.dmb"
    write_dmb(path, arr)
    out = read_dmb(path)
    np.testing.assert_array_equal(out, arr)


def test_dmb_header_bytes(tmp_path):
    """Header must be four little-endian int32: type=1, h, w, nb
    (fileIoUtils.h:334-375)."""
    arr = np.zeros((2, 3), np.float32)
    path = tmp_path / "x.dmb"
    write_dmb(path, arr)
    raw = path.read_bytes()
    assert np.frombuffer(raw[:16], "<i4").tolist() == [1, 2, 3, 1]
    assert len(raw) == 16 + 2 * 3 * 4


def test_pfm_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((12, 7)).astype(np.float32)
    path = tmp_path / "img.pfm"
    write_pfm(path, arr)
    np.testing.assert_array_equal(read_pfm(path), arr)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.standard_normal((50, 3)).astype(np.float32)
    nrm = rng.standard_normal((50, 3)).astype(np.float32)
    col = rng.integers(0, 256, (50, 3)).astype(np.uint8)
    path = tmp_path / "model.ply"
    write_ply(path, pts, nrm, col)
    p, n, c = read_ply(path)
    np.testing.assert_array_equal(p, pts)
    np.testing.assert_array_equal(n, nrm)
    np.testing.assert_array_equal(c, col)


def test_ply_zeroes_nonfinite(tmp_path):
    pts = np.array([[np.inf, 0, 0], [1, 2, 3]], np.float32)
    nrm = np.zeros((2, 3), np.float32)
    col = np.zeros(2, np.uint8)
    path = tmp_path / "m.ply"
    write_ply(path, pts, nrm, col)
    p, _, _ = read_ply(path)
    np.testing.assert_array_equal(p[0], [0, 0, 0])


def test_cam_file_roundtrip(tmp_path, rng):
    R, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    cam = CamFile(R=R, t=rng.standard_normal(3),
                  K=np.array([[100.0, 0, 32], [0, 101.0, 24], [0, 0, 1]]),
                  depth_min=2.0, depth_interval=0.1, depth_num=192,
                  depth_max=21.2)
    path = tmp_path / "00000000_cam.txt"
    write_cam_file(path, cam)
    out = read_cam_file(path)
    np.testing.assert_allclose(out.R, cam.R, atol=1e-6)
    np.testing.assert_allclose(out.t, cam.t, atol=1e-6)
    np.testing.assert_allclose(out.K, cam.K, atol=1e-6)
    assert out.depth_min == 2.0 and out.depth_max == 21.2


def test_pair_file_roundtrip(tmp_path):
    pair = PairFile(neighbors={0: [(1, 10.0), (2, 5.0)],
                               1: [(0, 9.0)],
                               2: [(0, 4.0), (1, 3.0)]})
    path = tmp_path / "pair.txt"
    write_pair_file(path, pair)
    out = read_pair_file(path)
    assert out.neighbors == pair.neighbors


def test_pair_view_selection_index_shift():
    """Reference semantics (main.cpp:1366-1377): the per-ref image list is
    [ref] + other views in id order, so neighbor id <= ref maps to id+1 and
    id > ref stays."""
    pair = PairFile(neighbors={2: [(0, 1.0), (1, 1.0), (3, 1.0), (4, 1.0)]})
    assert pair.view_selection(2) == [1, 2, 3, 4]
    assert pair.source_ids(2) == [0, 1, 3, 4]


def test_scene_export_contract(tmp_path, scene):
    root = scene.export(tmp_path / "scene")
    assert (root / "pair.txt").exists()
    assert (root / "cams" / "00000000_cam.txt").exists()
    assert (root / "images" / "00000000.png").exists()
    cam = read_cam_file(root / "cams" / "00000003_cam.txt")
    np.testing.assert_allclose(cam.P, scene.P[3], rtol=1e-5)
    from tsar_mvs_tpu.utils.synthetic import read_png_gray
    img = read_png_gray(root / "images" / "00000002.png")
    assert img.shape == scene.images[2].shape
    assert np.abs(img - np.clip(scene.images[2], 0, 255)).max() <= 1.0
