"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding tests work without TPU hardware (the SyntheticDataset
trick of the reference's arcface speed benchmark, SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 1-core hosts time-share the 8 device threads: a collective's slowest
    # participant can arrive minutes after the first, and XLA:CPU's default
    # 40 s rendezvous terminate timeout aborts the process (the r3
    # MULTICHIP red). Raise it far past any honest compile/execute skew.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=900"
              " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

# The session's sitecustomize force-registers the 'axon' TPU backend and
# pins jax_platforms="axon,cpu"; tests must run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
