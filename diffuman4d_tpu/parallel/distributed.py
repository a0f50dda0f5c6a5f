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


def local_data_rows(mesh) -> list[int]:
    """Data-axis rows of ``mesh`` whose model group this process hosts.

    The wave executor assigns task *i* of a wave to data row *i*; each
    process loads samples and encodes conditions only for its own rows
    (the multi-host replacement for the reference's per-GPU task queues,
    sampling_runner.py:26-43)."""
    pidx = jax.process_index()
    dev = np.asarray(mesh.devices)
    dev = dev.reshape(dev.shape[0], -1)  # (data, model...)
    return [d for d in range(dev.shape[0]) if dev[d, 0].process_index == pidx]


def put_sharded(mesh, spec, x):
    """Commit ``x`` to ``NamedSharding(mesh, spec)``, multi-process-safe.

    Accepts jax.Arrays (returned as-is when already equivalently sharded)
    or host-global arrays. Under multi-process, a host-global array with a
    leading ``"data"`` axis in ``spec`` is fed from this process's rows
    only; replicated specs feed the full array (every process must pass
    the same value)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    if isinstance(x, jax.Array) and x.sharding.is_equivalent_to(sharding, x.ndim):
        return x
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    if len(spec) and spec[0] == "data":
        arr = arr[local_data_rows(mesh)]
    return jax.make_array_from_process_local_data(sharding, arr)


def replicate_to_host(x, raw_bf16: bool = False) -> np.ndarray:
    """Fetch a (possibly multi-process global) array to host numpy,
    resharding to fully-replicated on device first. bf16 inputs are cast
    to fp32 on device (numpy's ml_dtypes bf16 path crawls — STATUS_r2) —
    or, with ``raw_bf16``, bitcast to uint16 on device and returned as
    the raw bf16 bit patterns (half the transfer bytes; callers bitcast
    back on device, see sampler.save_state)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.dtype == jnp.bfloat16:
        # eager ops (cached by the C++ dispatch fastpath — a fresh jit
        # here would retrace per call)
        x = (
            jax.lax.bitcast_convert_type(x, jnp.uint16)
            if raw_bf16
            else x.astype(jnp.float32)
        )
    if x.is_fully_addressable and x.sharding.num_devices == 1:
        return np.asarray(x)
    # mesh-global arrays: reshard to fully-replicated under jit (device_put
    # cross-process resharding is version-fragile). The identity trace per
    # call is cheap; the compile hits the persistent cache.
    rep = NamedSharding(x.sharding.mesh, P())
    out = jax.jit(lambda a: a, out_shardings=rep)(x)
    return np.asarray(out.addressable_data(0))


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
