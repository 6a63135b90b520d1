"""Whole-scene execution over a view-sharded device mesh.

The reference's outer parallelism is its shell loop over reference views
(scripts/courtyard.sh:28-48) — embarrassingly parallel. This module maps
the ENTIRE per-view pipeline onto a `("view",)` mesh, not just
PatchMatch: device phases run under `jax.shard_map` with each chip
processing its local reference views, host phases (weak-texture
detection, region RANSAC — CPU algorithms in the reference too,
main.cpp:365-596, 1519-1730) loop over views on the host between device
phases, and fusion rides the all-gather collective (`mesh.fuse_sharded`).

Phase structure (one compiled program per phase, shared by all refs):
  A. pyramid PatchMatch        — parallel.mesh.patchmatch_sharded
  B. confidence + LR check     — rl_cost_fused_traced per local ref
  C. coarse WMF outlier marks  — one program per pass (4x)
  D. host: weak texture + region RANSAC per ref
  E. fill + fine WMF + finalize — per-pass programs (6x + 2)
  F. fusion consistency votes  — all-gather + traced-ref votes

Divergences from the sequential `pipeline.process_view` path are
documented on `process_scene_sharded`.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams, FusionParams
from tsar_mvs_tpu.models import patchmatch as pm
from tsar_mvs_tpu.models import tsar
from tsar_mvs_tpu.models import weak_texture as wt
from tsar_mvs_tpu.ops import ncc, wmf
from tsar_mvs_tpu.parallel import mesh as pmesh


def _shard_over_refs(mesh, fn, *args_sharded, replicated=()):
    """Run `fn(local_tree, *replicated)` under shard_map with the leading
    (ref) axis of `args_sharded` partitioned over the view axis."""
    specs = tuple(jax.tree.map(lambda _: P("view"), a)
                  for a in args_sharded)
    rspecs = tuple(jax.tree.map(lambda _: P(), r) for r in replicated)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=specs + rspecs,
                       out_specs=P("view"))
    def run(*all_args):
        return fn(*all_args)

    return run(*(args_sharded + tuple(replicated)))


def confidence_sharded(mesh, states, batch: pm.SceneBatch,
                       imgs: jnp.ndarray, cams: geo.CameraSet,
                       params: AlgorithmParams):
    """Phase B: confidence + LR check for every ref (traced warps)."""

    def local(states_l, batch_l, imgs):
        R_loc = batch_l.ref_ids.shape[0]
        H, W = imgs.shape[1:]
        xx = jnp.arange(W, dtype=jnp.float32)[None, :]
        yy = jnp.arange(H, dtype=jnp.float32)[:, None]

        def one(i):
            st = jax.tree.map(lambda a: a[i], states_l)
            rl = ncc.rl_cost_fused_traced(
                imgs[batch_l.ref_ids[i]], imgs[batch_l.src_ids[i]],
                st.best_view, batch_l.src_ids[i], batch_l.src_valid[i],
                batch_l.A[i], batch_l.b[i], cams, st.normal, st.d,
                params)
            lrdiff = jnp.minimum(jnp.abs(st.cost - rl),
                                 params.lr_diff_clamp)
            confid = ((2.0 - st.cost) / 2.0 + (1.0 - lrdiff)) / 2.0
            depth = geo.depth_from_plane(cams, st.normal, st.d, xx, yy)
            disp = geo.disparity_depth(cams.f, cams.baseline, depth)
            return confid, lrdiff, disp

        return jax.lax.map(one, jnp.arange(R_loc))

    return _shard_over_refs(mesh, local, states, batch,
                            replicated=(imgs,))


def wmf_mark_sharded(mesh, states, ref_imgs, disps, reliables,
                     cams: geo.CameraSet, params: AlgorithmParams,
                     iters: int = 4):
    """Phase C: coarse WMF outlier marking, one program per pass
    (fusing passes stalls the TPU compiler — models/tsar.py:wmf_stage)."""
    H, W = ref_imgs.shape[1:]
    rays = geo.pixel_rays(cams, H, W)

    for it in range(iters):
        def local(args, it=it):
            states_l, gray_l, disp_l, rel_l = args

            def one(i):
                st = jax.tree.map(lambda a: a[i], states_l)
                return wmf.wmf_mark_outliers(gray_l[i], st.normal, st.d,
                                             disp_l[i], rel_l[i], it,
                                             cams, rays, params)

            return jax.lax.map(one, jnp.arange(gray_l.shape[0]))

        reliables = _shard_over_refs(
            mesh, local, (states, ref_imgs, disps, reliables))
    return reliables


def fill_finalize_sharded(mesh, states, ref_imgs, disps, reliables,
                          planes, labels, weak_regions, textureds,
                          R_orig_inv, cams: geo.CameraSet,
                          params: AlgorithmParams,
                          wmf_final_iters: int = 6):
    """Phase E: textureless fill, fine WMF hole-filling (per-pass
    programs), and finalize with per-ref world rotations."""
    H, W = ref_imgs.shape[1:]
    rays = geo.pixel_rays(cams, H, W)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]

    def local_fill(args):
        states_l, rel_l, planes_l, labels_l, weakr_l = args

        def one(i):
            st = jax.tree.map(lambda a: a[i], states_l)
            return tsar.fill_stage(cams, st, planes_l[i], labels_l[i],
                                   weakr_l[i], rel_l[i], params)

        return jax.lax.map(one, jnp.arange(rel_l.shape[0]))

    states, reliables, disps = _shard_over_refs(
        mesh, local_fill, (states, reliables, planes, labels,
                           weak_regions))

    for it in range(wmf_final_iters):
        def local_wmf(args, it=it):
            states_l, gray_l, disp_l, rel_l, tex_l = args

            def one(i):
                st = jax.tree.map(lambda a: a[i], states_l)
                n2, d2, dp2, rl2 = wmf.wmf_fill(
                    gray_l[i], st.normal, st.d, disp_l[i], rel_l[i],
                    tex_l[i], it, cams, rays, params)
                return st._replace(normal=n2, d=d2), dp2, rl2

            return jax.lax.map(one, jnp.arange(gray_l.shape[0]))

        states, disps, reliables = _shard_over_refs(
            mesh, local_wmf, (states, ref_imgs, disps, reliables,
                              textureds))

    def local_fin(args):
        states_l, Rinv_l = args

        def one(i):
            st = jax.tree.map(lambda a: a[i], states_l)
            depth = geo.depth_from_plane(cams, st.normal, st.d, xx, yy)
            depth = jnp.where(st.cost != ncc.MAXCOST, depth, 0.0)
            n_world = geo.matvec3(Rinv_l[i], st.normal)
            return depth, n_world

        return jax.lax.map(one, jnp.arange(Rinv_l.shape[0]))

    depths, normals_world = _shard_over_refs(
        mesh, local_fin, (states, R_orig_inv))
    return states, disps, reliables, depths, normals_world


def process_scene_sharded(scene, params: AlgorithmParams | None = None,
                          fp: FusionParams | None = None, seed: int = 0,
                          pm_iterations: int | None = None,
                          mesh=None, write_artifacts: bool = True,
                          fuse: bool = True):
    """Whole-scene sharded run: PatchMatch + TSAR refinement + fusion
    with reference views partitioned over the device mesh.

    Documented divergences from sequential `pipeline.process_view` ×
    `pipeline.fuse_scene`:
      * all reference views share view 0's intrinsics as K_ref
        (`build_scene_batch`; the reference likewise rebuilds every P
        with one K, cameraGeometryUtils.h:280-302);
      * the PRNG stream is keyed by global ref id (sharding-invariant)
        rather than the sequential path's per-view fold order;
      * fusion uses the parallel vote + host used-list replay
        (`fuse_sharded` + `apply_used_list`) whose emitted set is a
        documented superset of the sequential path at
        num_consistent > 1 (parallel/mesh.py:96-104).

    Returns (depths (R,H,W) np, normals_world (R,H,W,3) np, cloud or
    None).
    """
    from tsar_mvs_tpu import pipeline as pl

    params = pl.default_params_for_scene(scene, params)
    fp = fp or FusionParams()
    mesh = mesh or pmesh.view_mesh()
    n_dev = mesh.devices.size
    V = len(scene.names)
    H, W = scene.images.shape[1:]

    # --- batch construction (host) ---
    orders, vids = [], []
    for r in range(V):
        order, view_ids = pl.view_image_order(
            scene, r, params.max_views, min_angle=params.min_angle,
            max_angle=params.max_angle)
        orders.append(order)
        vids.append(view_ids)
    num_src = max(len(v) for v in vids)
    ref_ids = list(range(V))
    src_ids_per_ref = [o[1:] for o in orders]
    batch = pm.build_scene_batch(list(scene.P), ref_ids, src_ids_per_ref,
                                 num_src)
    cams = geo.build_camera_set(
        list(scene.P), cam_scale=params.cam_scale,
        depth_min=scene.depth_min, depth_max=scene.depth_max)
    imgs = jnp.asarray(scene.images, jnp.float32)
    key = jax.random.PRNGKey(seed)
    iters = params.iterations if pm_iterations is None else pm_iterations

    R_orig_inv = np.stack([
        np.linalg.pinv(geo.decompose_projection(
            np.asarray(scene.P[r], np.float64))[1]) for r in range(V)
    ]).astype(np.float32)

    # --- phase A: sharded PatchMatch (pyramid init handled inside) ---
    levels = pl.pyramid_levels_for(H)
    batch_p = pmesh.pad_batch(batch, n_dev)
    states = pmesh.patchmatch_sharded_pyramid(
        mesh, key, imgs, batch_p, cams, params, iters, levels=levels,
        P_list=list(scene.P), depth_min=scene.depth_min,
        depth_max=scene.depth_max)

    # --- phase B: confidence ---
    confids, lrdiffs, disps = confidence_sharded(
        mesh, states, batch_p, imgs, cams, params)

    ref_imgs = imgs[batch_p.ref_ids]
    reliables = jnp.ones((batch_p.ref_ids.shape[0], H, W), bool)

    # --- phase C: coarse WMF marks ---
    if params.wmf_iters > 0:
        reliables = wmf_mark_sharded(mesh, states, ref_imgs, disps,
                                     reliables, cams, params,
                                     iters=params.wmf_iters)

    # --- phase D (host): weak texture + region RANSAC per ref ---
    rel_np = np.asarray(reliables)
    disp_np = np.asarray(disps)
    weaks = [wt.detect_weak_texture(scene.images[r], params)
             for r in range(V)]
    max_regions = max(w.num_regions for w in weaks)
    planes = np.zeros((batch_p.ref_ids.shape[0], max_regions, 4),
                      np.float32)
    labels = np.zeros((batch_p.ref_ids.shape[0], H, W), np.int32)
    weak_regions = np.zeros((batch_p.ref_ids.shape[0], max_regions), bool)
    textureds = np.zeros((batch_p.ref_ids.shape[0], H, W), bool)
    for r in range(V):
        wk = weaks[r]
        pr = tsar.fit_region_planes(
            jax.random.fold_in(key, 999 + r), wk, disp_np[r], rel_np[r],
            cams, params)
        if params.border_check:
            fake = np.asarray(tsar.fake_depth_stage(
                cams, jnp.asarray(pr), jnp.asarray(wk.labels_full),
                jnp.asarray(wk.text == -1), params))
            jump = tsar.border_consistency_check(wk, fake, disp_np[r],
                                                 cams)
            veto = jump > params.border_check_thr * params.depth_min
            pr = np.where(veto[:, None], 0.0, pr).astype(np.float32)
        planes[r, :wk.num_regions] = pr
        labels[r] = wk.labels_full
        weak_regions[r, :wk.num_regions] = wk.text == -1
        textureds[r] = (wk.text == 1)[wk.labels_full]

    # --- phase E: fill + fine WMF + finalize ---
    Rinv_p = np.zeros((batch_p.ref_ids.shape[0], 3, 3), np.float32)
    Rinv_p[:V] = R_orig_inv
    states, disps, reliables, depths, normals_world = \
        fill_finalize_sharded(
            mesh, states, ref_imgs, disps, reliables,
            jnp.asarray(planes), jnp.asarray(labels),
            jnp.asarray(weak_regions), jnp.asarray(textureds),
            jnp.asarray(Rinv_p), cams, params,
            wmf_final_iters=params.wmf_final_iters)

    depths_np = np.asarray(depths)[:V]
    normals_np = np.asarray(normals_world)[:V]

    if write_artifacts:
        from tsar_mvs_tpu.utils import dmb
        for r in range(V):
            out_dir = Path(scene.root) / "results" / scene.names[r]
            out_dir.mkdir(parents=True, exist_ok=True)
            dmb.write_dmb(out_dir / "TSAR_disp.dmb", depths_np[r])
            dmb.write_dmb(out_dir / "TSAR_normals.dmb", normals_np[r])

    cloud = None
    if fuse:
        cams_world = geo.build_camera_set(list(scene.P),
                                          cam_scale=params.cam_scale,
                                          rebase=False)
        pad_v = (-V) % n_dev
        d_f = jnp.asarray(np.concatenate(
            [depths_np, np.zeros((pad_v, H, W), np.float32)])
            if pad_v else depths_np)
        n_f = jnp.asarray(np.concatenate(
            [normals_np, np.zeros((pad_v, H, W, 3), np.float32)])
            if pad_v else normals_np)
        if pad_v:
            P_pad = list(scene.P) + [scene.P[0]] * pad_v
            cams_world = geo.build_camera_set(P_pad,
                                              cam_scale=params.cam_scale,
                                              rebase=False)
        ps, nsum, count, emit, consumed = (
            np.asarray(x) for x in pmesh.fuse_sharded(
                mesh, d_f, n_f, cams_world, fp))
        emit = emit[:V].astype(bool)
        if fp.used_list:
            emit = pmesh.apply_used_list(
                emit, consumed[:V, :V].astype(bool))
        from tsar_mvs_tpu.models.fusion import FusedCloud
        pts, nrms, cols, view_of = [], [], [], []
        for r in range(V):
            denom = (count[r] + 1).astype(np.float32)[..., None]
            p_avg = ps[r] / denom
            n_avg = nsum[r] / denom
            n_avg /= np.maximum(
                np.linalg.norm(n_avg, axis=-1, keepdims=True), 1e-12)
            sel = emit[r]
            pts.append(p_avg[sel])
            nrms.append(n_avg[sel])
            cols.append(scene.images[r][sel].astype(np.uint8))
            view_of.append(np.full(int(sel.sum()), r, np.int32))
        cloud = FusedCloud(points=np.concatenate(pts),
                           normals=np.concatenate(nrms),
                           colors=np.concatenate(cols),
                           view_of=np.concatenate(view_of))
        if write_artifacts:
            from tsar_mvs_tpu.utils import ply
            out = Path(scene.root) / "results" / "TSAR_fused.ply"
            out.parent.mkdir(parents=True, exist_ok=True)
            ply.write_ply(out, cloud.points, cloud.normals, cloud.colors)

    return depths_np, normals_np, cloud
