"""Test harness setup: run everything on CPU with 8 virtual XLA devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4's
test-strategy gap — the reference has no test suite at all).

Note: this container's sitecustomize registers an 'axon' TPU backend and pins
jax_platforms programmatically, so the JAX_PLATFORMS env var alone is not
enough — we override via jax.config after import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
