"""End-to-end pipeline test: export a synthetic scene to disk, run the
scene pipeline through the CLI surface, fuse, and validate artifacts."""

import numpy as np
import pytest

from tsar_mvs_tpu.config import AlgorithmParams, FusionParams


@pytest.mark.slow
def test_scene_pipeline_end_to_end(tmp_path):
    from tsar_mvs_tpu.utils.synthetic import make_scene
    from tsar_mvs_tpu import pipeline
    from tsar_mvs_tpu.utils import dmb, ply

    scene_gt = make_scene(height=64, width=96, num_views=4, seed=2)
    root = scene_gt.export(tmp_path / "scene")

    params = AlgorithmParams(
        iterations=3, weak_text_num=20, hough_thr=12, min_line_length=10,
        max_line_gap=3, ransac_iters=1000, ransac_anneal_rounds=100,
        ransac_thr_base=0.01, ransac_thr_max=0.1, ransac_thr_step=0.005,
        wmf_drift_thr=2.0, wmf_final_iters=2, max_views=3)

    scene = pipeline.load_scene(root)
    assert scene.images.shape == (4, 64, 96)
    assert scene.pair.neighbors

    res = pipeline.process_view(scene, 0, params, pm_iterations=3)
    out = root / "results" / "00000000"
    assert (out / "TSAR_disp.dmb").exists()
    assert (out / "TSAR_normals.dmb").exists()
    assert (out / "TSAR_model.ply").exists()
    assert (out / "TSAR_slic.png").exists()
    results_txt = (out / "TSAR_results.txt").read_text()
    assert "Total runtime" in results_txt
    assert "SLIC:" in results_txt and "superpixels" in results_txt

    # Superpixel artifacts: full-res label map + A/B/C graph round-trip
    # (gSLICr_seg_engine.cpp:46-149 contract).
    labels = dmb.read_dmb(out / "TSAR_slic_labels.dmb")
    assert labels.shape == (64, 96)
    assert (labels == labels.astype(np.int32)).all()
    adj, sizes, borders = pipeline.read_slic_graph(
        out / "TSAR_slic_graph.txt")
    assert sum(sizes.values()) == labels.size // 16  # quarter-scale px
    assert set(np.unique(labels.astype(np.int32))) <= set(sizes)
    for (a, b), blen in borders.items():
        assert b in adj[a] and a in adj[b] and blen > 0

    depth = dmb.read_dmb(out / "TSAR_disp.dmb")
    assert depth.shape == (64, 96)
    gt = scene_gt.depth[0]
    ok = np.isfinite(gt)
    interior = np.zeros_like(ok)
    interior[6:-6, 6:-6] = ok[6:-6, 6:-6]
    valid = interior & (depth > 0)
    rel = np.abs(depth[valid] - gt[valid]) / gt[valid]
    assert np.median(rel) < 0.02

    normals = dmb.read_dmb(out / "TSAR_normals.dmb")
    assert normals.shape == (64, 96, 3)

    # Run the remaining views quickly and fuse.
    for ref in range(1, 4):
        pipeline.process_view(scene, ref, params, pm_iterations=3)
    fused = pipeline.fuse_scene(root, FusionParams(num_consistent=1,
                                                   used_list=True))
    pts, nrm, col = ply.read_ply(fused)
    assert pts.shape[0] > 1000
    assert np.isfinite(pts).all()
