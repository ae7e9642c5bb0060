"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests run over
``--xla_force_host_platform_device_count=8`` CPU devices, per the framework's
multi-chip validation strategy (see also ``__graft_entry__.dryrun_multichip``).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
