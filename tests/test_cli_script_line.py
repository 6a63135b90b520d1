"""End-to-end CLI test (own file: one xdist worker per e2e test —
three e2e programs in one CPU-backend process accumulate enough XLA
compiled-program state to segfault the worker)."""

import pytest

@pytest.mark.slow
def test_gipuma_cli_reference_script_line(tmp_path):
    """A scripts/courtyard.sh:44-style invocation runs verbatim: all
    positional images, -mslp_folder/-images_folder/-krt_file/
    -output_folder/-no_display, equals-style flags, and the script's
    unset-shell-var artifacts (`--min_angle=`)."""
    from tsar_mvs_tpu.utils.synthetic import make_scene
    from tsar_mvs_tpu.cli import main

    scene_gt = make_scene(height=48, width=64, num_views=3, seed=3)
    root = scene_gt.export(tmp_path / "scene")
    imgs = sorted(p.name for p in (root / "images").iterdir())
    argv = list(imgs) + [
        "-mslp_folder", str(root),
        "-images_folder", str(root / "images"),
        "-krt_file", "dino_par.txt",
        "-output_folder", str(root / "results"),
        "-no_display", "--cam_scale=1", "--iterations=1",
        "--blocksize=11", "--cost_gamma=10", "--cost_comb=best_n",
        "--n_best=1", "--min_angle=", "--max_angle="]
    assert main(argv) == 0
    out = root / "results" / imgs[0].split(".")[0]
    assert (out / "TSAR_disp.dmb").exists()
    assert (out / "TSAR_normals.dmb").exists()
