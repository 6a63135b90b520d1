"""End-to-end CLI test, exercised at the real process level.

The CLI runs in a SUBPROCESS (not in-process main(argv)): that is the
actual contract the reference's shell scripts use, and it isolates the
pytest worker from an XLA:CPU backend instability on this fleet — the
LLVM JIT compiling this program class segfaults sporadically under
concurrent compile load (observed in backend_compile_and_load,
put_executable_and_time AND get_executable_and_time across runs; with a
subprocess a backend crash fails the test instead of killing the xdist
worker)."""

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
def test_gipuma_cli_reference_script_line(tmp_path):
    """A scripts/courtyard.sh:44-style invocation runs verbatim: all
    positional images, -mslp_folder/-images_folder/-krt_file/
    -output_folder/-no_display, equals-style flags, and the script's
    unset-shell-var artifacts (`--min_angle=`)."""
    from tsar_mvs_tpu.utils.synthetic import make_scene

    scene_gt = make_scene(height=48, width=64, num_views=3, seed=3)
    root = scene_gt.export(tmp_path / "scene")
    imgs = sorted(p.name for p in (root / "images").iterdir())
    argv = ["gipuma"] + list(imgs) + [
        "-mslp_folder", str(root),
        "-images_folder", str(root / "images"),
        "-krt_file", "dino_par.txt",
        "-output_folder", str(root / "results"),
        "-no_display", "--cam_scale=1", "--iterations=1",
        "--blocksize=11", "--cost_gamma=10", "--cost_comb=best_n",
        "--n_best=1", "--min_angle=", "--max_angle="]
    proc = run_cli(argv, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = root / "results" / imgs[0].split(".")[0]
    assert (out / "TSAR_disp.dmb").exists()
    assert (out / "TSAR_normals.dmb").exists()
