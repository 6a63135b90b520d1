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
                       iterations: int) -> pm.PlaneState:
    """Run PatchMatch for every reference view, sharded over the mesh's
    view axis. Returns a stacked PlaneState with leading axis R
    (including padding slots; slice [:R_orig])."""
    n_dev = mesh.devices.size
    R_orig = batch.ref_ids.shape[0]
    batch = pad_batch(batch, n_dev)
    svol_planes = pm.svolume_plane_counts_batch(
        batch, imgs.shape[-2], imgs.shape[-1], params)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), jax.tree.map(lambda _: P("view"), batch)),
        out_specs=P("view"))
    def run(key, imgs, batch_local):
        return pm.run_patchmatch_many(key, imgs, batch_local, cams, params,
                                      iterations, svol_planes=svol_planes)

    state = run(key, imgs, batch)
    return jax.tree.map(lambda a: a[:R_orig], state)


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
    of `models.fusion.fuse`'s. Callers needing exact sequential
    used_list semantics use `fuse`.

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
