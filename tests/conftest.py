"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no fake/mock distributed backend (SURVEY.md section 4); we
create one with XLA's host-platform device-count flag so multi-chip sharding
logic is exercised in CI without TPU hardware.
"""

import os

# force CPU regardless of env (the axon TPU plugin registers itself via
# sitecustomize and sets JAX_PLATFORMS=axon, so setdefault is not enough)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
