"""Test configuration: force CPU with an 8-device virtual mesh.

The environment boots JAX with a remote-TPU backend preregistered (and
``JAX_PLATFORMS`` already set), and ``sitecustomize`` imports jax at
interpreter startup — so env vars alone are too late. Backends however are
initialized lazily, so overriding through ``jax.config`` before the first
device lookup works; ``XLA_FLAGS`` is read at CPU-client init which also
hasn't happened yet.
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

assert jax.default_backend() == "cpu", "tests must run on CPU"
