"""View-axis sharding over a `jax.sharding.Mesh`.

The reference's outer parallelism is a shell loop running the whole
program once per reference view (scripts/courtyard.sh:28-48) and once per
scene (x/*.sh) — embarrassingly parallel (SURVEY.md §2 parallelism
accounting). TPU-native mapping:

* reference views shard over a 1-D `("view",)` mesh axis (data parallel);
  images are small and replicated so per-view matching needs no
  cross-chip traffic;
* the only cross-view communication points — fusion consistency votes —
  ride ICI collectives: depth/normal maps are `all_gather`ed over the
  view axis and each chip votes for its local reference views.

Multi-host scaling therefore costs one all-gather of (V, H, W) float32
maps per scene, amortized over the entire per-view PatchMatch + TSAR
compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from tsar_mvs_tpu import geometry as geo
from tsar_mvs_tpu.config import AlgorithmParams, FusionParams
from tsar_mvs_tpu.models import patchmatch as pm
from tsar_mvs_tpu.models.fusion import fusion_votes_traced


def view_mesh(num_devices: int | None = None) -> Mesh:
    """1-D device mesh over the view axis."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("view",))


def pad_batch(batch: pm.SceneBatch, multiple: int) -> pm.SceneBatch:
    """Pad the reference-view axis to a multiple of the mesh size.
    Padded slots replay ref view 0 with no valid sources (cost MAXCOST
    everywhere; results discarded by the caller)."""
    R = batch.ref_ids.shape[0]
    pad = (-R) % multiple
    if pad == 0:
        return batch
    def pad0(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths)
    return pm.SceneBatch(
        ref_ids=pad0(batch.ref_ids),
        src_ids=pad0(batch.src_ids),
        src_valid=jnp.concatenate(
            [batch.src_valid,
             jnp.zeros((pad,) + batch.src_valid.shape[1:], bool)]),
        A=pad0(batch.A), b=pad0(batch.b))


def patchmatch_sharded(mesh: Mesh, key: jax.Array, imgs: jnp.ndarray,
                       batch: pm.SceneBatch, cams: geo.CameraSet,
                       params: AlgorithmParams,
                       iterations: int,
                       svol_planes: tuple[int, ...] | None = None,
                       init_states: pm.PlaneState | None = None
                       ) -> pm.PlaneState:
    """Run PatchMatch for every reference view, sharded over the mesh's
    view axis. Returns a stacked PlaneState with leading axis R
    (including padding slots; slice [:R_orig]). svol_planes overrides
    the batch-derived static plane counts; init_states (leading axis =
    padded R) seeds each ref with lifted prior planes."""
    n_dev = mesh.devices.size
    R_orig = batch.ref_ids.shape[0]
    batch = pad_batch(batch, n_dev)
    if svol_planes is None:
        svol_planes = pm.svolume_plane_counts_batch(
            batch, imgs.shape[-2], imgs.shape[-1], params)
    if init_states is not None:
        pad = batch.ref_ids.shape[0] - init_states.d.shape[0]
        if pad:
            init_states = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]),
                init_states)

    in_specs = [P(), P(), jax.tree.map(lambda _: P("view"), batch)]
    args = [key, imgs, batch]
    if init_states is not None:
        in_specs.append(jax.tree.map(lambda _: P("view"), init_states))
        args.append(init_states)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=tuple(in_specs), out_specs=P("view"))
    def run(key, imgs, batch_local, *rest):
        init = rest[0] if rest else None
        return pm.run_patchmatch_many(key, imgs, batch_local, cams, params,
                                      iterations, svol_planes=svol_planes,
                                      init_states=init)

    state = run(*args)
    return jax.tree.map(lambda a: a[:R_orig], state)


def scale_batch(batch: pm.SceneBatch, s: float) -> pm.SceneBatch:
    """Warp factors at pyramid scale s (K_s = diag(1/s, 1/s, 1) K):
    A_s = D A D^-1, b_s = D b."""
    D = jnp.asarray([1.0 / s, 1.0 / s, 1.0], jnp.float32)
    return batch._replace(A=batch.A * D[:, None] * (1.0 / D)[None, :],
                          b=batch.b * D)


def patchmatch_sharded_pyramid(mesh: Mesh, key: jax.Array,
                               imgs: jnp.ndarray, batch: pm.SceneBatch,
                               cams: geo.CameraSet,
                               params: AlgorithmParams, iterations: int,
                               levels: tuple[int, ...] = (4, 2, 1),
                               P_list=None, depth_min: float | None = None,
                               depth_max: float | None = None
                               ) -> pm.PlaneState:
    """Coarse-to-fine sharded PatchMatch (the APD-prior role of
    run_patchmatch_pyramid on the view mesh): per level the warp factors
    scale in-graph (scale_batch), images downsample device-side, and
    the lifted state re-enters the next level as init_states.

    P_list: raw world-frame projection matrices (per-level camera
    scalars rebuild through build_camera_set at each scale, exactly as
    the sequential pyramid does)."""
    import dataclasses
    assert levels[-1] == 1
    assert P_list is not None, "P_list required for per-level cameras"
    dmin = float(cams.depth_min) if depth_min is None else depth_min
    dmax = float(cams.depth_max) if depth_max is None else depth_max

    pyr = {1: imgs}
    fac, cur = 1, imgs
    while fac < max(levels):
        cur = pm.downsample_2x(cur)
        fac *= 2
        pyr[fac] = cur

    import numpy as np_
    state = None
    for li, s in enumerate(levels):
        imgs_s = pyr[s]
        Hs, Ws = imgs_s.shape[1:]
        cams_s = geo.build_camera_set(
            list(P_list), cam_scale=float(s) * params.cam_scale,
            depth_min=dmin, depth_max=dmax)
        params_s = dataclasses.replace(
            params,
            refine_dz0_frac=(params.refine_dz0_frac if li == 0
                             else min(params.refine_dz0_frac,
                                      params.refine_dz0_frac_fine)),
            prop_banks=(params.prop_banks if li == 0
                        else min(params.prop_banks,
                                 params.prop_banks_fine)),
        ).with_depth_range(dmin, dmax, float(cams_s.f))
        iters_li = (iterations if li == 0 or not params.iterations_fine
                    else min(iterations, params.iterations_fine))
        batch_s = scale_batch(batch, float(s)) if s != 1 else batch
        # Static shared plane counts at this level (host-side numpy).
        batch_np = pm.SceneBatch(
            ref_ids=np_.asarray(batch_s.ref_ids),
            src_ids=np_.asarray(batch_s.src_ids),
            src_valid=np_.asarray(batch_s.src_valid),
            A=np_.asarray(batch_s.A), b=np_.asarray(batch_s.b))
        svol = pm.svolume_plane_counts_batch(batch_np, Hs, Ws, params_s)
        if state is not None:
            up = jax.jit(jax.vmap(
                lambda st: pm.upsample_state_2x(st, cams_s, Hs, Ws)))
            state = up(state)
        state = patchmatch_sharded(mesh, jax.random.fold_in(key, li),
                                   imgs_s, batch_s, cams_s, params_s,
                                   iters_li, svol_planes=svol,
                                   init_states=state)
    return state


def fuse_sharded(mesh: Mesh, depths: jnp.ndarray, normals: jnp.ndarray,
                 cams_world: geo.CameraSet, fp: FusionParams):
    """Fusion consistency votes with views sharded over the mesh: each
    chip all-gathers the (V, H, W) depth/normal maps over ICI and votes
    for its local reference views with ONE traced-ref program
    (`fusion_votes_traced`) — no per-view recompilation.

    used_list de-dup is inherently sequential over reference views; this
    parallel path votes with an empty used mask and additionally returns
    each ref's consumed-source maps so `apply_used_list` can replay the
    emission de-dup on the host. The replay suppresses duplicate
    *emissions* exactly, but vote counts stay pre-dedup (the sequential
    path also denies consumed pixels the right to vote, so it prunes
    more at num_consistent thresholds) — parallel output is a superset
    of `models.fusion.fuse`'s. The delta is NOT small at
    num_consistent > 1: +85% emitted points on the 48x64x8-view proxy
    at num_consistent=2 (tests/test_parallel.py::
    test_fuse_sharded_num_consistent2_delta pins the semantics; at the
    default num_consistent=1 the replay is near-exact, see
    test_fuse_sharded_used_list_replay). Callers needing exact
    sequential used_list semantics use `fuse`.

    depths/normals enter sharded on the leading (view) axis. Returns
    (point_sum, normal_sum, count, emit, consumed) stacked over all V
    views; consumed has shape (V_ref, V_src, H, W).
    """
    V = depths.shape[0]
    n_dev = mesh.devices.size
    assert V % n_dev == 0, "pad views to the mesh size before fuse_sharded"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("view"), P("view")),
        out_specs=(P("view"),) * 5)
    def run(depths_local, normals_local):
        d_all = jax.lax.all_gather(depths_local, "view", tiled=True)
        n_all = jax.lax.all_gather(normals_local, "view", tiled=True)
        used = jnp.zeros(d_all.shape, bool)
        my = jax.lax.axis_index("view")
        R_loc = depths_local.shape[0]

        def one(r):
            ref_global = my * R_loc + r
            return fusion_votes_traced(ref_global, d_all, n_all,
                                       cams_world, used, fp)

        return jax.lax.map(one, jnp.arange(R_loc))

    return run(depths, normals)


def apply_used_list(emit: np.ndarray, consumed: np.ndarray) -> np.ndarray:
    """Sequential used_list replay over per-ref vote results (host side).

    emit: (V, H, W) pre-dedup emit masks; consumed: (V_ref, V_src, H, W)
    source pixels each ref's emitted points consumed. Returns deduped
    emit masks: a pixel already consumed by an earlier reference view no
    longer emits (models.fusion.fuse's `used` semantics at vote time,
    applied post-hoc)."""
    V = emit.shape[0]
    used = np.zeros_like(emit)
    out = np.zeros_like(emit)
    for r in range(V):
        keep = emit[r] & ~used[r]
        out[r] = keep
        # Only points still emitted consume their sources.
        used |= consumed[r] & keep[None]
    return out
