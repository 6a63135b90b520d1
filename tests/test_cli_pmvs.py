"""End-to-end CLI test (own file: one xdist worker per e2e test —
three e2e programs in one CPU-backend process accumulate enough XLA
compiled-program state to segfault the worker)."""

import pytest

@pytest.mark.slow
def test_gipuma_cli_pmvs_folder(tmp_path):
    """--pmvs_folder input (main.cpp:949-964): images from visualize/,
    Strecha P matrices from txt/, --camera_idx picks the reference."""
    from tsar_mvs_tpu.utils.synthetic import make_scene
    from tsar_mvs_tpu.cli import main

    scene_gt = make_scene(height=48, width=64, num_views=3, seed=3)
    root = scene_gt.export(tmp_path / "scene")
    pmvs = tmp_path / "pmvs"
    (pmvs / "visualize").mkdir(parents=True)
    (pmvs / "txt").mkdir()
    for i, png in enumerate(sorted((root / "images").glob("*.png"))):
        (pmvs / "visualize" / png.name).write_bytes(png.read_bytes())
        P = scene_gt.P[i]
        lines = "\n".join(" ".join(f"{v:.10g}" for v in row) for row in P)
        (pmvs / "txt" / f"{png.stem}.P").write_text(lines + "\n")
    argv = ["--pmvs_folder", str(pmvs), "--camera_idx", "1",
            "-mslp_folder", str(tmp_path / "scene"),
            "-output_folder", str(tmp_path / "results"),
            "-no_display", "--iterations=1",
            "--depth_min", f"{scene_gt.depth_min}",
            "--depth_max", f"{scene_gt.depth_max}"]
    assert main(argv) == 0
    out = tmp_path / "results" / "00000001"
    assert (out / "TSAR_disp.dmb").exists()
