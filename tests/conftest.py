"""Test configuration: force a deterministic 8-device virtual CPU mesh.

Sharding/collective tests need multiple devices; we simulate them on CPU
(the driver's dryrun does the same for the multi-chip path).
Must run before jax is imported anywhere in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(__file__))
