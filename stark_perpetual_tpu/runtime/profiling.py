"""Tracing + roofline accounting (SURVEY.md section 5 'tracing/profiling').

The reference has no profiling in its main path (only the cairo-compile
trace artifacts and a log_time helper); for a production TPU deployment we
provide:
  - `trace(dir)`: a context manager around jax.profiler for on-device
    traces viewable in TensorBoard/XProf.
  - `kernel_roofline(...)`: analytic speed-of-light accounting for the hot
    kernels, comparing measured wall time against VPU/MXU/HBM bounds.
"""

import contextlib
import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# Per-chip peaks (v5e defaults; override for other generations).
V5E_PEAKS = dict(
    vpu_int32_ops=2.4e13,  # measured mul+add chain throughput (bench notes)
    mxu_bf16_flops=3.94e14,
    hbm_bytes=8.1e11,
)


@dataclass
class Roofline:
    name: str
    wall_s: float
    vpu_ops: float
    mxu_flops: float
    hbm_bytes: float
    peaks: Dict[str, float]

    @property
    def bounds(self) -> Dict[str, float]:
        return {
            "vpu_s": self.vpu_ops / self.peaks["vpu_int32_ops"],
            "mxu_s": self.mxu_flops / self.peaks["mxu_bf16_flops"],
            "hbm_s": self.hbm_bytes / self.peaks["hbm_bytes"],
        }

    @property
    def speed_of_light_s(self) -> float:
        return max(self.bounds.values())

    @property
    def efficiency(self) -> float:
        return self.speed_of_light_s / self.wall_s if self.wall_s else 0.0

    def report(self) -> str:
        b = self.bounds
        return (
            f"{self.name}: wall {self.wall_s*1e3:.2f} ms | bound "
            f"vpu {b['vpu_s']*1e3:.2f} / mxu {b['mxu_s']*1e3:.3f} / "
            f"hbm {b['hbm_s']*1e3:.3f} ms | SoL efficiency {self.efficiency:.1%}"
        )


def measure(fn: Callable, *args, reps: int = 5) -> float:
    """Median-free simple best-of wall time with a warmup call."""
    out = fn(*args)
    jax.tree_util.tree_leaves(out)[0].block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        best = min(best, time.time() - t0)
    return best


def pedersen_roofline(n_hashes: int, wall_s: float, peaks=None) -> Roofline:
    """Analytic cost of the Pallas MSM kernel per hash:
    64 windows x (~12 mont_muls x ~900 int32 ops + selects) on the VPU,
    64 one-hot (256x84) int8 matmuls on the MXU, and the digit/output HBM
    traffic."""
    per_hash_vpu = 64 * (12 * 900 + 400)
    per_hash_mxu = 64 * 2 * 256 * 84  # int8 MACs ~ flops
    per_hash_hbm = (64 + 63 * 2 + 21 * 2) * 4  # digits in + acc out + inputs
    return Roofline(
        name=f"pedersen[{n_hashes}]",
        wall_s=wall_s,
        vpu_ops=per_hash_vpu * n_hashes,
        mxu_flops=per_hash_mxu * n_hashes,
        hbm_bytes=per_hash_hbm * n_hashes,
        peaks=peaks or V5E_PEAKS,
    )
