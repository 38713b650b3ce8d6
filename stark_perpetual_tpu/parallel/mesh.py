"""Device-mesh helpers.

The framework scales along two logical axes:
  - "dp": batch/data parallelism (hash/signature/leaf batches sharded).
  - "sp": transform parallelism (NTT butterfly row-sharding, FRI folds).
On a single slice both ride ICI; across slices the outer axis maps to DCN.
The reference has no analog (single-process: SURVEY.md section 2.5).
"""

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """1-D mesh over the first n_devices (default: all local devices)."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    import numpy as np

    if len(axis_names) == 1:
        arr = np.array(devices)
    else:
        # Split devices as evenly as possible: outer axis = hosts/DCN.
        n = len(devices)
        outer = 1
        for cand in range(int(n**0.5), 0, -1):
            if n % cand == 0:
                outer = cand
                break
        arr = np.array(devices).reshape(outer, n // outer)
    return Mesh(arr, axis_names)


def multi_host_initialize() -> None:
    """Initialize jax.distributed when running under a multi-host launcher.

    No-op in single-process environments (the common local/test case).
    """
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
