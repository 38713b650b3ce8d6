"""Benchmarks: the BASELINE.json north-star configs on the attached device.

Prints one JSON line per metric: {"metric", "value", "unit", "vs_baseline"}.
The headline (batched Pedersen, target 1e6 hashes/s/chip from BASELINE.json)
prints first so a failure in a secondary metric never loses it; each
secondary metric is isolated in its own try/except. Diagnostics go to
stderr.

vs_baseline is the ratio against the per-metric target. BASELINE.json names
only the 1M Pedersen/s/chip number; the other targets are this repo's own
floor expectations, documented next to each constant.
"""

import json
import os
import sys
import threading
import time
import traceback

_T0 = time.time()
# Wall-clock budget: the driver runs bench.py under a timeout; being KILLED
# loses the exit status and risks wedging the device tunnel mid-operation.
# Instead a watchdog exits 0 with whatever metrics already flushed. The
# secondary list is ordered cheapest-compile-first so a cold-cache run
# maximizes coverage; a warm persistent cache (below) fits everything.
# 700: the one observed external kill (round 2) came at ~730s of output,
# so the driver's own timeout is at least that; a clean self-exit at 700
# beats both wedging the tunnel and skipping the prover metrics.
BUDGET = float(os.environ.get("BENCH_BUDGET", "700"))


def _watchdog():
    def expire():
        print(
            f"bench budget ({BUDGET:.0f}s) expired; exiting with partial results",
            file=sys.stderr,
            flush=True,
        )
        os._exit(0)

    t = threading.Timer(max(BUDGET - (time.time() - _T0), 1.0), expire)
    t.daemon = True
    t.start()


def _remaining() -> float:
    return BUDGET - (time.time() - _T0)


import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

TARGET_HASHES_PER_SEC = 1_000_000.0  # BASELINE.json north star
TARGET_ECDSA_PER_SEC = 100_000.0  # repo floor: 2^14-batch AIR-mimic verifies
TARGET_NTT20_WALL = 1.0  # seconds, 2^20-point forward NTT
TARGET_NTT24_WALL = 8.0  # seconds, 2^24-point forward NTT (north-star size)
TARGET_LDE20_WALL = 8.0  # seconds, 2^20 coeffs -> 2^23 coset evals (blowup 8)
TARGET_STARK_PROVE_WALL = 600.0  # seconds, pedersen-builtin AIR, 8 pooled hashes
TARGET_BATCH_PROVE_WALL = 600.0  # seconds, business-logic proofs of a 4-tx batch


def emit(metric: str, value: float, unit: str, target: float, invert: bool = False):
    """invert=True for wall-times (smaller is better): ratio = target/value."""
    ratio = (target / value) if invert else (value / target)
    print(
        json.dumps(
            {"metric": metric, "value": value, "unit": unit, "vs_baseline": ratio}
        ),
        flush=True,
    )


def bench_pedersen() -> None:
    from stark_perpetual_tpu.crypto import signature as hostsig
    from stark_perpetual_tpu.ops import pedersen as P
    from stark_perpetual_tpu.ops.field import stark_prime_field

    f = stark_prime_field()
    n = 1 << 16

    # Golden vector in lane 0 keeps the measurement honest (bit-exactness
    # is asserted on every bench run).
    a0 = 0x3D937C035C878245CAF64531A5756109C53068DA139362728FEB561405371CB
    b0 = 0x208A0A10250E382E1E4BBE2880906C2791BF6275695E02FBBC6AEFF9CD8B31A
    h0 = 0x30E480BED5FE53FA909CC0F8C4D99B8F9F2C016BE4C41E13A4848797979C662
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 12, size=(n, 21), dtype=np.int64).astype(np.int32)
    b = rng.integers(0, 1 << 12, size=(n, 21), dtype=np.int64).astype(np.int32)
    a[:, 20] &= 0x7FF  # keep < 2^251 <= p
    b[:, 20] &= 0x7FF
    a[0], b[0] = f.pack(a0), f.pack(b0)
    a = jax.device_put(jnp.asarray(a))  # keep inputs resident on the chip:
    b = jax.device_put(jnp.asarray(b))  # host->device is not part of the metric

    fn = P.pedersen_hash_batch()
    t0 = time.time()
    h, ok = fn(a, b)
    np.asarray(h[:1])  # fetch-sync: block_until_ready alone does not sync
    # through the remote-device tunnel
    print(f"pedersen compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    assert int(f.unpack(h)[0]) == h0, "bench output not bit-exact!"

    reps = 5
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            h, ok = fn(a, b)
        np.asarray(h[:1])
        best = min(best, (time.time() - t0) / reps)
    rate = n / best

    t0 = time.time()
    hostsig.pedersen_hash(a0, b0)
    print(
        f"host single hash: {time.time() - t0:.4f}s; device: {rate:,.0f}/s",
        file=sys.stderr,
    )
    emit("pedersen_hashes_per_sec_per_chip", rate, "hashes/s", TARGET_HASHES_PER_SEC)


def bench_ecdsa() -> None:
    """2^14-lane AIR-mimic verify with 256 DISTINCT signatures tiled across
    the batch (varied messages, keys, table indices — not one replicated
    lane)."""
    import random

    from stark_perpetual_tpu.crypto import signature as hostsig
    from stark_perpetual_tpu.ops.ecdsa_pallas import _verify_fn
    from stark_perpetual_tpu.ops.field import pack_ints
    from stark_perpetual_tpu.params import EC_ORDER, FIELD_PRIME

    rng = random.Random(7)
    n_distinct = 256
    n = 1 << 14
    msgs, rs, ws, pubs, ys = [], [], [], [], []
    for _ in range(n_distinct):
        priv = rng.randrange(1, EC_ORDER)
        msg = rng.getrandbits(250)
        r, s = hostsig.sign(msg, priv)
        pub = hostsig.private_to_stark_key(priv)
        y = hostsig.get_y_coordinate(pub)
        if not hostsig.verify(msg, r, s, (pub, y)):
            y = (-y) % FIELD_PRIME
        msgs.append(msg)
        rs.append(r)
        ws.append(pow(s, -1, EC_ORDER))
        pubs.append((pub << 252) % FIELD_PRIME)
        ys.append((y << 252) % FIELD_PRIME)

    reps_tile = n // n_distinct
    args = [
        jax.device_put(jnp.asarray(np.tile(pack_ints(vals), (reps_tile, 1))))
        for vals in (msgs, rs, ws, pubs, ys)
    ]
    fn = _verify_fn()
    t0 = time.time()
    valid = fn(*args)
    np.asarray(valid[:1])
    print(f"ecdsa compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    assert bool(np.asarray(valid).all()), "a distinct-signature lane failed!"
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        valid = fn(*args)
        np.asarray(valid[:1])
        best = min(best, time.time() - t0)
    emit("ecdsa_verifies_per_sec", n / best, "verifies/s", TARGET_ECDSA_PER_SEC)


def _ntt_input(m: int) -> jnp.ndarray:
    coeffs = np.random.default_rng(1).integers(0, 1 << 12, (m, 21)).astype(np.int32)
    coeffs[:, 20] &= 0x7FF
    return jax.device_put(jnp.asarray(coeffs))


def bench_ntt(log2m: int, target: float) -> None:
    from stark_perpetual_tpu.ops.ntt import ntt_ops

    m = 1 << log2m
    x = _ntt_input(m)
    ntt = ntt_ops()
    t0 = time.time()
    np.asarray(ntt.ntt(x)[:8])  # fetch: block_until_ready alone does not
    # sync through the remote-device tunnel
    print(f"ntt 2^{log2m} compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    np.asarray(ntt.ntt(x)[:8])  # discard one warm run (remote pipeline)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = ntt.ntt(x)
        np.asarray(out[:8])
        best = min(best, time.time() - t0)
    emit(f"ntt_2e{log2m}_wall", best, "s", target, invert=True)


def bench_lde() -> None:
    """2^20 coefficients -> blowup-8 coset evaluations (the prover's LDE)."""
    from stark_perpetual_tpu.ops.ntt import ntt_ops
    from stark_perpetual_tpu.params import FIELD_GEN

    m = 1 << 20
    x = _ntt_input(m)
    ntt = ntt_ops()
    t0 = time.time()
    np.asarray(ntt.lde(x, 8, shift=FIELD_GEN)[:8])
    print(f"lde 2^20x8 compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
    np.asarray(ntt.lde(x, 8, shift=FIELD_GEN)[:8])
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = ntt.lde(x, 8, shift=FIELD_GEN)
        np.asarray(out[:8])
        best = min(best, time.time() - t0)
    emit("lde_2e20_blowup8_wall", best, "s", TARGET_LDE20_WALL, invert=True)


def bench_stark_prove() -> None:
    """Pooled pedersen-builtin AIR: prove 8 hash obligations end to end
    (DEEP-ALI prover: trace+composition commits, OOD openings, FRI)."""
    import random

    from stark_perpetual_tpu.crypto.signature import pedersen_hash as _ph
    from stark_perpetual_tpu.models.air import StarkProver, verify_stark
    from stark_perpetual_tpu.models.pedersen_air import PedersenBuiltinAir

    rng = random.Random(0)
    pairs = [(rng.randrange(1 << 251), rng.randrange(1 << 251)) for _ in range(8)]
    air = PedersenBuiltinAir(pairs, [_ph(a, b) for a, b in pairs])
    trace = air.trace()
    prover = StarkProver(air, blowup=4, n_queries=16)
    t0 = time.time()
    proof = prover.prove(trace)  # per-process loads + first dispatch
    warm = time.time() - t0
    # Emit the load-inclusive wall immediately: through the remote tunnel
    # the per-process executable loads dominate and vary with tunnel
    # health, so a watchdog exit mid-verify must not lose the datum.
    emit(
        "stark_prove_pedersen8_first_wall",
        warm,
        "s",
        TARGET_STARK_PROVE_WALL,
        invert=True,
    )
    assert verify_stark(air, proof)
    t0 = time.time()
    proof = prover.prove(trace)  # steady state (like every other metric)
    dt = time.time() - t0
    print(
        f"stark_prove: {dt:.1f}s steady-state for 8 hashes "
        f"(first prove incl. compiles/loads: {warm:.1f}s), "
        f"security {proof.security_bits} bits",
        file=sys.stderr,
    )
    emit("stark_prove_pedersen8_wall", dt, "s", TARGET_STARK_PROVE_WALL, invert=True)


def bench_batch_execution_prove() -> None:
    """Business-logic proofs of a mixed perpetual batch end to end: the
    witnessed-schedule fulfillment bus AIR + the position-cell AIR over a
    deposit + trade + funding batch (builtin pools collected, not proven —
    they have their own metric above).

    The fused prover traces its programs under the 'columns' mont_mul
    lowering automatically (models/air._fused_mont_mode); the proof
    bundle covers five business-logic AIRs (fulfillment + position
    buses, order links, position status, transition rules)."""
    from stark_perpetual_tpu.models.perpetual.prove import (
        batch_public_context,
        prove_batch_execution,
        verify_batch_execution,
    )
    from stark_perpetual_tpu.models.perpetual.sample import sample_batch_input

    program_input = sample_batch_input(n_trades=1)
    t0 = time.time()
    proofs, result = prove_batch_execution(
        program_input, blowup=4, n_queries=16, prove_builtins=False
    )
    dt = time.time() - t0
    assert proofs.fulfillment_proof is not None and proofs.position_proof is not None
    assert proofs.status_proof is not None and proofs.transition_proof is not None
    print(
        f"batch_execution_prove: {dt:.1f}s (5 AIRs: fulfillment "
        f"n={proofs.fulfillment_proof.trace_length}, position "
        f"n={proofs.position_proof.trace_length}, incl. per-process loads)",
        file=sys.stderr,
    )
    # Emit before verifying: a watchdog exit mid-verification must not
    # lose the measured prove wall. Verification of this exact bundle is
    # asserted right after (and covered by tests/test_batch_execution.py).
    emit("batch_execution_prove_wall", dt, "s", TARGET_BATCH_PROVE_WALL, invert=True)
    assert verify_batch_execution(
        proofs, context=batch_public_context(program_input, result)
    )
    print(
        "batch_execution_prove: bundle verified (public-context bound)",
        file=sys.stderr,
    )


def main() -> int:
    _watchdog()
    bench_pedersen()  # headline: always first, never guarded
    # (name, fn, warm-cache cost estimate in seconds on the attached chip).
    # Ordered cheap-and-reliable first. The prover metrics run on the
    # fused device-resident path (ops/fused_prover.py): steady-state
    # proves are seconds; their wall cost is mostly loading the cached
    # columns-mode executables once per process. Estimates assume the
    # persistent XLA cache is warm (kept in-repo at .jax_cache_tpu; cold
    # compiles are bounded by the watchdog instead).
    secondaries = [
        ("ecdsa", bench_ecdsa, 95.0),
        ("ntt24", lambda: bench_ntt(24, TARGET_NTT24_WALL), 190.0),  # north star
        # stark_prove outranks the cheap stable metrics: on a slow-tunnel
        # day (ecdsa compile+first observed up to 200 s) the budget may
        # not fit everything, and the prover wall is the number that
        # moves round over round while ntt20/lde barely change.
        ("stark_prove", bench_stark_prove, 400.0),
        ("ntt20", lambda: bench_ntt(20, TARGET_NTT20_WALL), 60.0),
        ("lde20", bench_lde, 75.0),
        # First-in-process batch prove is executable-load-bound through
        # the tunnel (~1200-1400 s with the thread-parallel bundle) — it
        # never fits the budget after the other metrics, so its measured
        # walls live in BASELINE.md (round 5: 14.6 s steady, 1213 s first).
        ("batch_prove", bench_batch_execution_prove, 1250.0),
    ]
    if os.environ.get("BENCH_HEADLINE_ONLY") == "1":
        return 0
    only = os.environ.get("BENCH_ONLY")
    if only:
        wanted = {w.strip() for w in only.split(",")}
        secondaries = [s for s in secondaries if s[0] in wanted]
    for name, fn, est in secondaries:
        # Skip a metric that cannot finish in the remaining budget (a clean
        # skip beats a watchdog kill mid-dispatch, which can leave the
        # remote-TPU service draining abandoned work for the next caller).
        if _remaining() < est * 0.8:
            print(f"skip {name}: {_remaining():.0f}s left (warm est {est:.0f}s)",
                  file=sys.stderr, flush=True)
            continue
        try:
            fn()
        except Exception:
            traceback.print_exc(file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
