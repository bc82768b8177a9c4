"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding tests work without TPU hardware (the SyntheticDataset
trick of the reference's arcface speed benchmark, SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session's sitecustomize force-registers the 'axon' TPU backend and
# pins jax_platforms="axon,cpu"; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
