"""Scene/view pipeline orchestration with the reference's on-disk contract.

Directory layout consumed/produced (reference: main.cpp:1352-1376,
1457-1474, 1825-1843; x/*.sh):

    <scene>/images/<name>.png|.pfm       input views
    <scene>/cams/<name>_cam.txt          MVSNet-style cameras + depth range
    <scene>/pair.txt                     ranked source views per reference
    <scene>/APD/<name>/depths_geom.dmb   optional prior depth (APD contract)
    <scene>/APD/<name>/normals.dmb       optional prior normals
    <scene>/APD/<name>/weak.png          optional reliability seed
    <scene>/results/<name>/TSAR_disp.dmb      output metric depth
    <scene>/results/<name>/TSAR_normals.dmb   output world-frame normals
    <scene>/results/<name>/TSAR_model.ply     per-view point cloud
    <scene>/results/<name>/TSAR_results.txt   runtime log
    <scene>/results/TSAR_fused.ply            fused scene cloud

When no APD prior exists the pipeline runs its own full random-init
PatchMatch (the reference contains the same matcher with its driver loop
commented out, gipuma.cu:1744-1754 — BASELINE.json's north star makes it
first-class here).
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams, FusionParams
from tsar_mvs_tpu.models import fusion as fusion_mod
from tsar_mvs_tpu.models import patchmatch as pm
from tsar_mvs_tpu.models import tsar
from tsar_mvs_tpu.models import weak_texture as wt
from tsar_mvs_tpu.ops import slic as slic_mod
from tsar_mvs_tpu.utils import dmb, ply, scene_io
from tsar_mvs_tpu.utils.pfm import read_pfm
from tsar_mvs_tpu.utils.synthetic import read_png_gray


@dataclass
class Scene:
    root: Path
    names: list[str]               # view names in id order
    images: np.ndarray             # (V, H, W) float32 grayscale
    P: np.ndarray                  # (V, 3, 4) world-frame projections
    depth_min: float
    depth_max: float
    pair: scene_io.PairFile
    # (V, 3, H, W) float32 RGB, lazily loaded for -color_processing
    # (the reference loads img_color only then too, main.cpp:1303-1306).
    images_color: np.ndarray | None = None
    images_dir: Path | None = None
    # Scene-shared static s-volume plane counts per pyramid level,
    # computed once and reused by every reference view so the whole
    # scene runs on one compiled PatchMatch program per level (the
    # reference's compile-once binary, scripts/courtyard.sh:28-48).
    # Keyed by (level_scale, n_src); populated by scene_plane_counts.
    _svol_counts_cache: dict | None = None

    def load_color(self) -> np.ndarray:
        if self.images_color is None:
            self.images_color = np.stack(
                [_read_rgb(self._image_path(n)) for n in self.names])
        return self.images_color

    def _image_path(self, name: str) -> Path:
        img_dir = self.images_dir or self.root / "images"
        for ext in (".png", ".pfm", ".jpg", ".jpeg", ".JPG"):
            p = img_dir / f"{name}{ext}"
            if p.exists():
                return p
        raise FileNotFoundError(name)


def load_scene(root: str | Path, images_folder: str | Path | None = None,
               p_folder: str | Path | None = None,
               calib_file: str | Path | None = None,
               depth_min: float | None = None,
               depth_max: float | None = None) -> Scene:
    """Load a scene with the reference's camera-source precedence
    (getCameraParameters, cameraGeometryUtils.h:174-240): KITTI
    `calib_file` (two views) > Strecha `p_folder` (`<name>.P` files) >
    Middlebury `cams/<name>_cam.txt` (the krt path, which also supplies
    the depth range from view 0). `images_folder` overrides where the
    view images load from (main.cpp:1302)."""
    root = Path(root)
    img_dir = Path(images_folder) if images_folder else root / "images"
    exts = (".png", ".pfm", ".jpg", ".jpeg", ".JPG")
    paths = {}
    for p in sorted(img_dir.iterdir()):
        if p.suffix in exts and p.stem not in paths:
            paths[p.stem] = p
    names = sorted(paths)
    images = []
    P_list = []
    for name in names:
        images.append(_read_gray(paths[name]))

    if calib_file is not None:
        P0, P1 = scene_io.read_kitti_calib(calib_file)
        if len(names) != 2:
            raise ValueError("-calib_file is a two-view (KITTI) contract; "
                             f"got {len(names)} images")
        P_list = [P0, P1]
    elif p_folder is not None:
        p_folder = Path(p_folder)
        for name in names:
            p_path = p_folder / f"{name}.P"
            if not p_path.exists():  # reference appends to the full
                p_path = p_folder / f"{name}.png.P"  # filename (.png.P)
            P_list.append(scene_io.read_p_file(p_path))
    else:
        for name in names:
            cam = scene_io.read_cam_file(root / "cams" / f"{name}_cam.txt")
            P_list.append(cam.P)
            if depth_min is None:
                depth_min, depth_max = cam.depth_min, cam.depth_max
    if depth_min is None:
        depth_min, depth_max = -1.0, -1.0

    pair_path = root / "pair.txt"
    pair = (scene_io.read_pair_file(pair_path) if pair_path.exists()
            else scene_io.PairFile())
    return Scene(root=root, names=names, images=np.stack(images),
                 P=np.stack(P_list), depth_min=float(depth_min),
                 depth_max=float(depth_max), pair=pair,
                 images_dir=img_dir)


def _read_gray(path: Path) -> np.ndarray:
    """Grayscale float32 image from .pfm/.png/.jpg (the reference reads
    every view IMREAD_GRAYSCALE, main.cpp:1302)."""
    if path.suffix == ".pfm":
        img = read_pfm(path)
        if img.ndim == 3:
            img = img.mean(axis=-1)
        return np.asarray(img, np.float32)
    if path.suffix == ".png":
        return np.asarray(read_png_gray(path), np.float32)
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"), np.float32)


def _read_rgb(path: Path) -> np.ndarray:
    """(3, H, W) float32 RGB (IMREAD_COLOR analogue, main.cpp:1305;
    grayscale sources broadcast to three equal channels)."""
    if path.suffix == ".pfm":
        img = np.asarray(read_pfm(path), np.float32)
        if img.ndim == 2:
            img = np.repeat(img[None], 3, axis=0)
        else:
            img = img.transpose(2, 0, 1)[:3]
        return img
    from PIL import Image
    arr = np.asarray(Image.open(path).convert("RGB"), np.float32)
    return arr.transpose(2, 0, 1)


def view_image_order(scene: Scene, ref_idx: int, max_views: int,
                     min_angle: float = 5.0, max_angle: float = 45.0
                     ) -> tuple[list[int], tuple[int, ...]]:
    """Per-reference image ordering: [ref] + source views from pair.txt
    (dataset ids, the active reference path main.cpp:1345-1384), falling
    back to the legacy angle-based selectViews when pair.txt is absent
    (main.cpp:1011-1096). Returns (image ids in pipeline order, source
    positions 1..S)."""
    if scene.pair.neighbors:
        src = scene.pair.source_ids(ref_idx, max_views)
    else:
        from tsar_mvs_tpu.models.view_selection import select_views_angle
        src = select_views_angle(list(scene.P), ref_idx, scene.depth_min,
                                 scene.depth_max, min_angle=min_angle,
                                 max_angle=max_angle, max_views=max_views)
        if not src:  # degenerate rigs (e.g. tiny synthetic scenes)
            src = [i for i in range(len(scene.names))
                   if i != ref_idx][:max_views]
    order = [ref_idx] + list(src)
    view_ids = tuple(range(1, len(order)))
    return order, view_ids


def default_params_for_scene(scene: Scene,
                             params: AlgorithmParams | None = None
                             ) -> AlgorithmParams:
    params = params or AlgorithmParams()
    K, _, _ = geo.decompose_projection(scene.P[0])
    f = K[0, 0] / params.cam_scale
    return params.with_depth_range(scene.depth_min, scene.depth_max, f)


def pyramid_levels_for(height: int) -> tuple[int, ...]:
    """Coarse-to-fine downsample factors for the prior-generating
    pyramid (subsumes APD's multi-scale role, SURVEY.md §2 #28)."""
    return (4, 2, 1) if height >= 1024 else (2, 1)


def scene_plane_counts(scene: Scene, params: AlgorithmParams,
                       levels: tuple[int, ...], n_src: int
                       ) -> list[tuple[int, ...] | None]:
    """Scene-shared static s-volume plane counts per pyramid level (max
    over all reference views, budget re-applied), cached on the Scene:
    every view of the scene then hits the same compiled PatchMatch
    program per level instead of recompiling for its own geometry."""
    H, W = scene.images.shape[1:]
    if pm.resolve_ncc_impl(params, H, W) not in ("svolume", "pallas"):
        return [None] * len(levels)
    if scene._svol_counts_cache is None:
        scene._svol_counts_cache = {}
    out = []
    # Per-level image dims follow downsample_2x halving.
    dims = {1: (H, W)}
    h, w, fac = H, W, 1
    while fac < max(levels):
        h, w, fac = h // 2, w // 2, fac * 2
        dims[fac] = (h, w)
    for s in levels:
        key = (s, n_src)
        if key not in scene._svol_counts_cache:
            cams_list, vids_list = [], []
            for ref_idx in range(len(scene.names)):
                order, view_ids = view_image_order(
                    scene, ref_idx, params.max_views,
                    min_angle=params.min_angle,
                    max_angle=params.max_angle)
                if len(view_ids) != n_src:
                    continue
                cams_list.append(geo.build_camera_set(
                    [scene.P[i] for i in order],
                    cam_scale=float(s) * params.cam_scale,
                    depth_min=scene.depth_min,
                    depth_max=scene.depth_max))
                vids_list.append(view_ids)
            Hs, Ws = dims[s]
            scene._svol_counts_cache[key] = \
                pm.svolume_plane_counts_shared(cams_list, vids_list,
                                               Hs, Ws, params)
        out.append(scene._svol_counts_cache[key])
    return out


def run_slic_stage(gray: np.ndarray, params: AlgorithmParams
                   ) -> tuple[np.ndarray, slic_mod.SlicResult]:
    """SLIC superpixels on the quarter-scale reference image + graph
    build (gslic, main.cpp:598-662: 2x pyrDown then gSLICr with
    spixel_size=20, coh_weight=5, 5 iters, no connectivity; the
    adjacency/membership/border lists the TSAR authors appended are
    built by `ops.slic.superpixel_graph_host` from the labels).

    Returns (full-resolution nearest-upsampled labels, quarter-scale
    SlicResult)."""
    q = pm.downsample_2x(pm.downsample_2x(jnp.asarray(gray, jnp.float32)))
    feat = slic_mod.gray_to_feature(q)
    res = slic_mod.slic(feat, spixel_size=params.slic_spixel_size,
                        coh_weight=params.slic_coh_weight,
                        n_iters=params.slic_iters)
    lab = np.asarray(res.labels)
    lab_full = np.repeat(np.repeat(lab, 4, axis=0), 4, axis=1)
    H, W = gray.shape
    lab_full = lab_full[:H, :W]
    if lab_full.shape != (H, W):  # odd sizes: edge-pad
        lab_full = np.pad(lab_full, ((0, H - lab_full.shape[0]),
                                     (0, W - lab_full.shape[1])),
                          mode="edge")
    return lab_full, res


def write_slic_graph(path: Path, adjacency: dict, sizes: dict,
                     borders: dict) -> None:
    """Persist the superpixel A/B/C graph (adjacency, membership size,
    shared-border length — gSLICr_seg_engine.cpp:46-149 builds these on
    the CPU and this snapshot only max-prints them). One line per
    superpixel: `id size n_neighbors nb:borderlen ...`."""
    with Path(path).open("w") as fh:
        fh.write(f"{len(sizes)}\n")
        for label in sorted(sizes):
            nbs = sorted(adjacency.get(label, ()))
            parts = [f"{label}", f"{sizes[label]}", f"{len(nbs)}"]
            for nb in nbs:
                key = (min(label, nb), max(label, nb))
                parts.append(f"{nb}:{borders.get(key, 0)}")
            fh.write(" ".join(parts) + "\n")


def read_slic_graph(path: Path) -> tuple[dict, dict, dict]:
    """Inverse of write_slic_graph."""
    adjacency: dict[int, set[int]] = {}
    sizes: dict[int, int] = {}
    borders: dict[tuple[int, int], int] = {}
    lines = Path(path).read_text().splitlines()
    for ln in lines[1:]:
        toks = ln.split()
        label, size, n_nb = int(toks[0]), int(toks[1]), int(toks[2])
        sizes[label] = size
        adjacency[label] = set()
        for t in toks[3:3 + n_nb]:
            nb, bl = t.split(":")
            nb = int(nb)
            adjacency[label].add(nb)
            borders[(min(label, nb), max(label, nb))] = int(bl)
    return adjacency, sizes, borders


def process_view(scene: Scene, ref_idx: int,
                 params: AlgorithmParams | None = None,
                 key: jax.Array | None = None,
                 out_dir: str | Path | None = None,
                 pm_iterations: int | None = None,
                 write_ply: bool = True,
                 write_vis: bool = False) -> tsar.TsarResult:
    """Full per-view TSAR run (texture -> [prior|PatchMatch] -> refine ->
    artifacts), mirroring runGipuma (main.cpp:1268-1861)."""
    t0 = time.time()
    key = jax.random.PRNGKey(0) if key is None else key
    params = default_params_for_scene(scene, params)

    order, view_ids = view_image_order(scene, ref_idx, params.max_views,
                                       min_angle=params.min_angle,
                                       max_angle=params.max_angle)
    imgs = scene.images[order]
    cams = geo.build_camera_set([scene.P[i] for i in order],
                                cam_scale=params.cam_scale,
                                depth_min=scene.depth_min,
                                depth_max=scene.depth_max)

    name = scene.names[ref_idx]
    weak = wt.detect_weak_texture(scene.images[ref_idx], params)
    # SLIC superpixels on the quarter-scale image (main.cpp:598-662 runs
    # unconditionally before the matcher); the graph lists mirror the A/B/C
    # build the snapshot max-prints (gSLICr_seg_engine.cpp:46-149).
    slic_labels, slic_res = run_slic_stage(scene.images[ref_idx], params)
    slic_adj, slic_sizes, slic_borders = \
        slic_mod.superpixel_graph_host(slic_res.labels)

    prior_dir = scene.root / "APD" / name
    imgs_j = jnp.asarray(imgs, jnp.float32)
    stats_rays = geo.pixel_rays(cams, *imgs.shape[1:])
    reliable_seed = None
    if (prior_dir / "depths_geom.dmb").exists():
        # APD prior path (main.cpp:1457-1514): lift prior depth/normals,
        # seed reliability from weak.png.
        prior_depth = jnp.asarray(dmb.read_dmb(prior_dir
                                               / "depths_geom.dmb"))
        prior_normal = jnp.asarray(dmb.read_dmb(prior_dir / "normals.dmb"))
        state = pm.state_from_prior(prior_depth, prior_normal, cams,
                                    _stats_stub(stats_rays))
        weak_png = prior_dir / "weak.png"
        if weak_png.exists():
            seed_img = read_png_gray(weak_png)
            reliable_seed = seed_img > 0
        iters = 0 if pm_iterations is None else pm_iterations
        if iters > 0:
            state = pm.run_patchmatch(key, imgs_j, view_ids, cams, params,
                                      iterations=iters, init_state=state)
    else:
        # No APD prior: generate our own with coarse-to-fine PatchMatch
        # (subsumes APD's multi-scale role, SURVEY.md §2 #28).
        iters = params.iterations if pm_iterations is None else pm_iterations
        H = imgs.shape[1]
        levels = pyramid_levels_for(H)
        imgs_color = None
        if params.color_processing:
            imgs_color = jnp.asarray(scene.load_color()[order],
                                     jnp.float32)
        state = pm.run_patchmatch_pyramid(
            key, imgs_j, view_ids, [scene.P[i] for i in order], params,
            levels=levels,
            iterations_per_level=pm.iteration_schedule(
                dataclasses.replace(params, iterations=iters),
                len(levels)),
            depth_min=scene.depth_min, depth_max=scene.depth_max,
            imgs_color=imgs_color,
            svol_planes_per_level=scene_plane_counts(
                scene, params, levels, len(view_ids)))

    result = tsar.tsar_refine(imgs, cams, view_ids, params, state, weak,
                              reliable_seed, jax.random.fold_in(key, 999))

    if out_dir is None:
        out_dir = scene.root / "results" / name
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    dmb.write_dmb(out_dir / "TSAR_disp.dmb", result.depth)
    dmb.write_dmb(out_dir / "TSAR_normals.dmb", result.normal_world)
    # SLIC boundary visualization (Draw_Segmentation_Result +
    # main.cpp:655-657 write it unconditionally).
    from tsar_mvs_tpu.utils import display as _display
    _display.write_png(out_dir / "TSAR_slic.png",
                       _display.slic_boundaries_for_display(
                           np.asarray(slic_res.labels),
                           np.asarray(pm.downsample_2x(pm.downsample_2x(
                               jnp.asarray(scene.images[ref_idx]))))))
    # Superpixel artifacts for downstream consumers: the full-resolution
    # label map (the reference keeps labels only in unified memory,
    # lines->suoyin; we persist them) plus the A/B/C adjacency /
    # membership / shared-border-length graph the TSAR authors appended
    # to gSLICr (gSLICr_seg_engine.cpp:46-149, which this snapshot only
    # max-prints).
    dmb.write_dmb(out_dir / "TSAR_slic_labels.dmb",
                  slic_labels.astype(np.float32))
    write_slic_graph(out_dir / "TSAR_slic_graph.txt", slic_adj,
                     slic_sizes, slic_borders)
    if write_ply:
        cams_world = geo.build_camera_set([scene.P[i] for i in order],
                                          cam_scale=params.cam_scale,
                                          rebase=False)
        rgb = (scene.load_color()[ref_idx] if params.color_processing
               else None)
        write_view_ply(out_dir / "TSAR_model.ply", result,
                       scene.images[ref_idx], cams_world, rgb=rgb)
    if write_vis:
        # Debug/display artifacts (main.cpp:1800-1817 normal PNG with
        # sphere legend + disparity PNG; writeParametersToFile).
        from tsar_mvs_tpu.utils import display
        display.write_png(out_dir / "TSAR_normals.png",
                          display.add_sphere_legend(
                              display.normals_for_display(
                                  result.normal_world)))
        display.write_png(out_dir / "TSAR_disp.png",
                          display.disparity_for_display(result.depth))
        display.write_png(out_dir / "TSAR_confidence.png",
                          display.confidence_for_display(
                              result.confidence))
        display.write_parameters_file(out_dir / "TSAR_params.txt", params)
    runtime = time.time() - t0
    with (out_dir / "TSAR_results.txt").open("a") as fh:
        fh.write(f"Total runtime: {runtime:.3f} sec "
                 f"( {runtime / 60.0:.3f} min)\n")
        # The reference max-prints the superpixel graph stats
        # (gSLICr_seg_engine.cpp:46-149); log them per view.
        fh.write(f"SLIC: {len(slic_sizes)} superpixels, "
                 f"{sum(len(v) for v in slic_adj.values()) // 2} "
                 f"adjacencies, {len(slic_borders)} shared borders\n")
    return result


def _stats_stub(rays):
    """Minimal stats carrier for state_from_prior (only .rays is used)."""
    class _S:
        pass
    s = _S()
    s.rays = rays
    return s


def write_view_ply(path: Path, result: tsar.TsarResult, gray: np.ndarray,
                   cams_world: geo.CameraSet,
                   rgb: np.ndarray | None = None) -> None:
    """Per-view point cloud in the world frame (storePlyFileBinary
    contract, displayUtils.h:78-159; every pixel emits a vertex, invalid
    depths become the origin). rgb (3, H, W): true point colors
    (-color_processing; the reference's ply stores grayscale)."""
    H, W = result.depth.shape
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    X = np.asarray(geo.backproject(cams_world, 0, jnp.asarray(xx),
                                   jnp.asarray(yy),
                                   jnp.asarray(result.depth)))
    bad = ~np.isfinite(X).all(axis=-1) | (result.depth <= 0)[..., None][..., 0]
    X = np.where(bad[..., None], 0.0, X)
    if rgb is not None:
        colors = np.clip(rgb, 0, 255).astype(np.uint8)
        colors = colors.transpose(1, 2, 0).reshape(-1, 3)
    else:
        colors = np.clip(gray, 0, 255).astype(np.uint8).reshape(-1)
    ply.write_ply(path, X.reshape(-1, 3),
                  result.normal_world.reshape(-1, 3), colors)


def process_scene(scene_root: str | Path,
                  params: AlgorithmParams | None = None,
                  seed: int = 0, pm_iterations: int | None = None,
                  write_ply: bool = True, resume: bool = False,
                  sharded: str | bool = "auto"
                  ) -> list[tsar.TsarResult | None]:
    """Run every reference view of a scene (the scripts/*.sh loop).

    ``resume=True`` gives the reference's file-granular checkpointing
    (SURVEY.md §5: each view's artifacts are independent, so a crashed
    scene restarts at the first view without a TSAR_disp.dmb; completed
    views return None instead of being recomputed).

    ``sharded``: "auto" uses the view-sharded mesh driver
    (parallel.scene_sharded) when more than one device is visible —
    the reference's shell loop over views mapped onto the chips; True
    forces it, False forces the sequential per-view loop. The sharded
    path writes TSAR_disp/TSAR_normals artifacts but returns None
    entries (no per-view TsarResult materialization) and does not
    support resume (it runs all views in one program)."""
    scene = load_scene(scene_root)
    use_sharded = (sharded is True
                   or (sharded == "auto" and len(jax.devices()) > 1
                       and not resume))
    if use_sharded:
        from tsar_mvs_tpu.parallel import scene_sharded as ss
        ss.process_scene_sharded(scene, params, seed=seed,
                                 pm_iterations=pm_iterations, fuse=False)
        return [None] * len(scene.names)
    results = []
    for ref_idx in range(len(scene.names)):
        name = scene.names[ref_idx]
        done = scene.root / "results" / name / "TSAR_disp.dmb"
        if resume and done.exists():
            results.append(None)
            continue
        key = jax.random.fold_in(jax.random.PRNGKey(seed), ref_idx)
        results.append(process_view(scene, ref_idx, params, key,
                                    pm_iterations=pm_iterations,
                                    write_ply=write_ply))
    return results


def fuse_scene(scene_root: str | Path,
               fp: FusionParams | None = None,
               params: AlgorithmParams | None = None) -> Path:
    """Fuse per-view TSAR outputs into a scene point cloud (x/*.sh +
    Fusion.exe contract)."""
    scene = load_scene(scene_root)
    fp = fp or FusionParams()
    params = default_params_for_scene(scene, params)
    depths, normals = [], []
    for name in scene.names:
        d = dmb.read_dmb(scene.root / "results" / name / "TSAR_disp.dmb")
        n = dmb.read_dmb(scene.root / "results" / name
                         / "TSAR_normals.dmb")
        depths.append(d)
        normals.append(n)
    cams_world = geo.build_camera_set(list(scene.P),
                                      cam_scale=params.cam_scale,
                                      rebase=False)
    cloud = fusion_mod.fuse(np.stack(depths), np.stack(normals),
                            cams_world, scene.images, fp)
    out = scene.root / "results" / "TSAR_fused.ply"
    ply.write_ply(out, cloud.points, cloud.normals, cloud.colors)
    return out
