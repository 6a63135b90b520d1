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
from tsar_mvs_tpu.models.fusion import fusion_votes


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

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), jax.tree.map(lambda _: P("view"), batch)),
        out_specs=P("view"))
    def run(key, imgs, batch_local):
        return pm.run_patchmatch_many(key, imgs, batch_local, cams, params,
                                      iterations)

    state = run(key, imgs, batch)
    return jax.tree.map(lambda a: a[:R_orig], state)


def fuse_sharded(mesh: Mesh, depths: jnp.ndarray, normals: jnp.ndarray,
                 cams_world: geo.CameraSet, fp: FusionParams):
    """Fusion consistency votes with views sharded over the mesh: each
    chip all-gathers the (V, H, W) depth/normal maps over ICI and votes
    for its local reference views (used_list de-dup not applied — it is
    inherently sequential; callers wanting it run `models.fusion.fuse`).

    depths/normals enter sharded on the leading (view) axis. Returns
    (point_sum, normal_sum, count, emit) stacked over all V views.
    """
    V = depths.shape[0]
    n_dev = mesh.devices.size
    assert V % n_dev == 0, "pad views to the mesh size before fuse_sharded"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("view"), P("view")),
        out_specs=(P("view"), P("view"), P("view"), P("view")))
    def run(depths_local, normals_local):
        d_all = jax.lax.all_gather(depths_local, "view", tiled=True)
        n_all = jax.lax.all_gather(normals_local, "view", tiled=True)
        used = jnp.zeros(d_all.shape, bool)
        my = jax.lax.axis_index("view")
        R_loc = depths_local.shape[0]
        ps_l, ns_l, cnt_l, emit_l = [], [], [], []
        for r in range(R_loc):
            # Local ref index -> global view id (static per-position
            # branch over the gathered stack).
            ref_global = my * R_loc + r
            ps, ns, cnt, emit, _ = _votes_dynamic(ref_global, d_all, n_all,
                                                  cams_world, used, fp, V)
            ps_l.append(ps)
            ns_l.append(ns)
            cnt_l.append(cnt)
            emit_l.append(emit)
        return (jnp.stack(ps_l), jnp.stack(ns_l), jnp.stack(cnt_l),
                jnp.stack(emit_l))

    return run(depths, normals)


def _votes_dynamic(ref_global, depths, normals, cams, used, fp, V):
    """fusion_votes with a traced reference id: evaluated via lax.switch
    over the static per-view programs (V is small; the reference binary
    is likewise re-run per view)."""
    branches = [
        (lambda rr: (lambda d, n, u: fusion_votes(rr, d, n, cams, u, fp,
                                                  V)))(r)
        for r in range(V)
    ]
    return jax.lax.switch(ref_global, branches, depths, normals, used)
