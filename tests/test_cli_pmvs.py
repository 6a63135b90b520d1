"""End-to-end PMVS-layout CLI test, exercised at the real process
level (subprocess; see tests/test_cli_script_line.py for why)."""

import os
import subprocess
import sys

import pytest


def run_cli(args, cwd):
    env = dict(os.environ)
    env["TSAR_FORCE_CPU"] = "1"
    return subprocess.run(
        [sys.executable, "-m", "tsar_mvs_tpu.cli"] + args,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_gipuma_cli_pmvs_folder(tmp_path):
    """--pmvs_folder input (main.cpp:949-964): images from visualize/,
    Strecha P matrices from txt/, --camera_idx picks the reference."""
    from tsar_mvs_tpu.utils.synthetic import make_scene

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
    argv = ["gipuma", "--pmvs_folder", str(pmvs), "--camera_idx", "1",
            "-mslp_folder", str(tmp_path / "scene"),
            "-output_folder", str(tmp_path / "results"),
            "-no_display", "--iterations=1",
            "--depth_min", f"{scene_gt.depth_min}",
            "--depth_max", f"{scene_gt.depth_max}"]
    proc = run_cli(argv, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = tmp_path / "results" / "00000001"
    assert (out / "TSAR_disp.dmb").exists()
