"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run over
``--xla_force_host_platform_device_count=8`` CPU devices, per the framework's
multi-chip validation strategy (see also ``__graft_entry__.dryrun_multichip``).

Note: the environment's sitecustomize imports jax at interpreter start (axon
TPU registration), so setting ``JAX_PLATFORMS`` via os.environ here is too
late — the config must be updated through the jax API as well. Tests must
never touch the real chip: it is single-tenant and a hung/crashed test would
wedge the whole session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
