"""Multi-host helpers: single-process degenerate behavior (a real pod
cannot be exercised here; these pin the API contract each entry point
relies on)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def test_initialize_noop_single_host(monkeypatch):
    from diffuman4d_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert distributed.initialize() is False  # no env, no args -> no-op


def test_global_mesh_and_host_local_to_global():
    from diffuman4d_tpu.parallel import distributed

    mesh = distributed.global_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}

    batch = {
        "x": np.arange(4 * 3, dtype=np.float32).reshape(4, 3),
        "y": np.ones((4, 2, 2), np.float32),
    }
    out = distributed.host_local_to_global(mesh, P("data"), batch)
    assert isinstance(out["x"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    # sharded over data axis
    assert out["x"].sharding.spec == P("data")
    # and consumable by a jitted reduction
    assert float(jnp.sum(out["y"])) == 16.0
