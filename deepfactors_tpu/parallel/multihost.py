"""Multi-host (multi-process) entry point: jax.distributed bring-up + global
mesh construction for the distributed BA / large-map paths.

The reference is strictly single-process (SURVEY.md §2.3); this is the
scale-out design of SURVEY §7.1: one process per host, ``jax.distributed``
over DCN, factors sharded per host, XLA collectives over ICI within a host
and DCN across hosts. The same code path runs:

  - single-process (initialize() is a no-op, mesh = local devices)
  - multi-process TPU pods (env-driven coordinator discovery)
  - multi-process CPU smoke tests (tools/multihost_demo.py runs two
    processes with a local coordinator and a virtual device count)

Per-host factor sharding: each host constructs the ShardedFactorData rows it
owns (host_factor_slice) and hands them to ``host_local_to_global`` which
builds the globally-sharded arrays from per-host shards
(jax.make_array_from_process_local_data).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Bring up jax.distributed when running multi-process.

    With no arguments this is env-driven (TPU pods auto-discover the
    coordinator; single-process stays single-process). Explicit arguments
    support the CPU two-process smoke test. Idempotent."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    if coordinator_address is None and num_processes is None:
        # single process (or env-driven pod bring-up handled by the TPU
        # runtime); the local mesh is the global mesh. NOTE: do not probe
        # jax.process_count() here — it would initialise the XLA backend,
        # after which jax.distributed.initialize refuses to run.
        _INITIALIZED = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def global_mesh(axis: str = "factors",
                n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over every device of every process (ICI within a host, DCN
    across hosts — XLA routes the psum hierarchy automatically)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def host_factor_slice(n_factors: int) -> slice:
    """The contiguous factor range THIS process owns (factors are
    block-partitioned across processes; pad n_factors to a multiple of
    process_count * local_device_count first)."""
    pc, pid = jax.process_count(), jax.process_index()
    per = n_factors // pc
    assert per * pc == n_factors, (
        f"n_factors={n_factors} must divide process_count={pc}")
    return slice(pid * per, (pid + 1) * per)


def host_local_to_global(mesh: Mesh, axis: str, local_tree):
    """Assemble globally-sharded arrays from per-process local shards.

    ``local_tree``: pytree of np/jnp arrays holding only THIS process's
    factor rows (leading axis = local factor count). Returns the same pytree
    as global jax.Arrays sharded over ``axis`` (single-process: a plain
    device_put with the sharding)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding),
                            local_tree)

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(to_global, local_tree)
