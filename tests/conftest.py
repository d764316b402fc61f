"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is exercised without TPU hardware via
`--xla_force_host_platform_device_count` (the "fake backend" layer; see
SURVEY.md §4).

This image boots an `axon` remote-TPU PJRT plugin from sitecustomize and
force-sets `jax_platforms=axon,cpu` at interpreter start, so plain env vars
are not enough — we must write the config back to cpu before the first jax
operation triggers backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
