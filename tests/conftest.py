"""Test configuration: run everything on an 8-device virtual CPU mesh.

Note: this image's sitecustomize imports jax at interpreter startup (axon
TPU plugin), so JAX_PLATFORMS env is already latched — use
``jax.config.update`` instead, which works as long as no backend has been
initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compile cache: XLA:CPU compiles dominate suite runtime on this
# 1-core host; cache hits make reruns of unchanged programs near-free
from diffuman4d_tpu.utils.jax_setup import setup as _jax_cache_setup  # noqa: E402

_jax_cache_setup()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: multi-minute test (compile-heavy or multi-process)")
