"""Multi-host distributed runtime initialization.

The reference is a single-process single-GPU binary (SURVEY.md §5
"Distributed communication backend: absent"); its multi-host story is
"run the shell loop on more machines". The TPU-native equivalent is
`jax.distributed` + a global mesh: every host calls `initialize()` at
startup, after which `jax.devices()` spans all hosts and the view-axis
mesh in `parallel.mesh` shards reference views fleet-wide with the
fusion all-gather riding ICI/DCN.

Environment contract (set by the launcher on every host):
    TSAR_COORDINATOR     host:port of process 0 (enables multi-host mode)
    TSAR_NUM_PROCESSES   total number of host processes
    TSAR_PROCESS_ID      this host's rank

Single-process runs (the common case, and every test) need none of
these: `initialize()` is a no-op and the mesh falls back to the local
devices.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize() -> bool:
    """Initialize jax.distributed from the environment. Returns True when
    multi-host mode is active. Idempotent; safe to call unconditionally
    at every entry point."""
    global _initialized
    coord = os.environ.get("TSAR_COORDINATOR")
    if not coord or _initialized:
        return _initialized
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ.get("TSAR_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("TSAR_PROCESS_ID", "0")))
    _initialized = True
    return True


def global_view_mesh(num_devices: int | None = None) -> Mesh:
    """1-D ("view",) mesh over all devices of all initialized hosts."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), ("view",))


def process_local_slice(n_total: int) -> slice:
    """This host's contiguous slice of a length-n_total view axis (for
    host-side input loading of a globally sharded batch)."""
    p = jax.process_index()
    n = jax.process_count()
    per = -(-n_total // n)
    return slice(p * per, min((p + 1) * per, n_total))
