"""Multi-host (TPU pod) execution support.

The reference tops out at multi-GPU threads on one machine
(src/samplers/sampling_runner.py:26-43). On TPU pods, JAX runs one
process per host, each seeing a slice of the global device set; SPMD
programs are written against the GLOBAL mesh and each process feeds the
shards it hosts. This module wraps the three pieces the framework needs:

  * :func:`initialize` — ``jax.distributed.initialize`` with env-driven
    defaults; a no-op on single-host (so every entry point can call it
    unconditionally, like ``utils.jax_setup.setup``).
  * :func:`global_mesh` — the (data, model) mesh over the global device
    set (``parallel.mesh.make_mesh`` over ``jax.devices()`` already is
    global; this adds the process-count sanity checks).
  * :func:`host_local_to_global` — build a global sharded array from each
    process's local shard of the batch (the wave executor's conditions:
    each host loads only the tasks its mesh rows own).

Real pods cannot be exercised in this environment; single-process
behavior (the degenerate path of every function) is covered by tests,
and the wave executor consumes only the documented JAX APIs.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX if this looks like a multi-process run.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > TPU pod metadata
    (``jax.distributed.initialize()`` with no args auto-detects on Cloud
    TPU). Returns True when distributed mode was initialized."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    env_id = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None
    )
    process_id = process_id if process_id is not None else (
        int(env_id) if env_id else None
    )

    if coordinator_address is None and num_processes is None:
        # single host (or Cloud TPU auto-detect explicitly opted out)
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
        return True
    except RuntimeError as e:  # already initialized — idempotent entry points
        if "already" in str(e).lower():
            return True
        raise


def global_mesh(data: int | None = None, model: int = 1):
    """(data, model) mesh over the GLOBAL device set, with pod sanity
    checks: the per-process device slice must tile the mesh so each host
    feeds whole mesh rows (process boundaries may not split a task's
    model group)."""
    from diffuman4d_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=data, model=model, devices=jax.devices())
    n_local = jax.local_device_count()
    if model > 1 and n_local % model != 0 and jax.process_count() > 1:
        raise ValueError(
            f"model={model} straddles host boundaries "
            f"({n_local} local devices); choose model | local_device_count"
        )
    return mesh


def host_local_to_global(mesh, spec, tree):
    """Assemble global arrays from this process's host-local shard.

    ``tree``'s leaves hold only the rows this process feeds (its share of
    the leading/batch axis per ``spec``); the result is a pytree of global
    jax.Arrays addressable by the SPMD program. Single-process: equivalent
    to ``device_put`` with the same sharding."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )
