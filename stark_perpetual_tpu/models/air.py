"""Generic AIR -> STARK proving framework (trace, constraints, FRI).

The framework layer that turns an algebraic intermediate representation
(trace columns + transition/boundary constraints) into a FRI-backed
low-degree proof, with every polynomial-sized operation batched on the
device (NTT/LDE, constraint evaluation, batched inversion for quotients,
Merkle commitment, FRI folds).

This is the stage-9 scaffold of the build plan (SURVEY.md section 7): the
perpetual business logic (models/perpetual) defines *what* must hold; an
`Air` subclass encodes those relations as polynomial constraints. The
framework is exercised end-to-end by the Fibonacci demo AIR in tests and by
`PedersenAir`-style traces in later rounds.

Soundness design (DEEP-ALI):
  - The transcript binds the public inputs: a Merkle hash of the proof
    geometry (n, blowup, n_queries, grinding), the boundary assertions and
    the AIR's `public_inputs()` is absorbed before the trace root.
  - The composition polynomial (one alpha per constraint, quotients by the
    transition/boundary divisors) is split into `transition_degree` parts of
    degree < n, each committed in a second Merkle tree.
  - An out-of-domain point z is drawn AFTER all commitments; the prover
    sends T_j(z), T_j(g z) and H_i(z), and the verifier checks the
    composition identity at z directly — a cheating composition commitment
    survives with probability ~deg/p over z.
  - FRI then runs on the DEEP quotient
        sum_j gamma_j (T_j(x) - T_j(z))/(x - z)
      + sum_j gamma'_j (T_j(x) - T_j(g z))/(x - g z)
      + sum_i gamma''_i (H_i(x) - H_i(z))/(x - z),
    which is low-degree iff the committed codewords actually take the
    claimed values at z — binding the OOD check to the commitments.
  - FRI query indices are deduplicated (each contributes full soundness)
    and optionally grinded (proof-of-work nonce before query sampling).
  - Per-constraint degree-adjustment terms are deliberately omitted: the
    split H commitment fixes the composition degree bound at
    n * transition_degree, and the OOD identity catches any rational
    (non-polynomial) composition; adjustment terms only tighten the bound,
    they are not needed for soundness here.
  - `stark_security_bits` reports the conjectured level for a given
    (blowup, n_queries, grinding) configuration.
"""

import functools
import os
from dataclasses import dataclass, field as dataclass_field
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from stark_perpetual_tpu.ops.field import N_LIMBS, stark_prime_field, unpack_ints
from stark_perpetual_tpu.ops.fri import Channel, FriProof, fri_commit, fri_verify
from stark_perpetual_tpu.ops.merkle import (
    auth_path_from_levels,
    dense_commit_device,
    verify_path,
)
from stark_perpetual_tpu.ops.ntt import ntt_ops, root_of_unity
from stark_perpetual_tpu.ops.pedersen import pedersen_hash_ints
from stark_perpetual_tpu.params import FIELD_GEN, FIELD_PRIME


class Air:
    """An algebraic intermediate representation.

    Subclasses define:
      n_columns: trace width.
      transition_degree: max algebraic degree of transition constraints.
      eval_transitions(f, cur, nxt, pub) -> list of (rows, 21) limb arrays,
        the constraint values C_k(f(x), f(g x), p(x)) evaluated lane-wise
        (device, Montgomery domain).
      transition_exprs_host(cur_vals, nxt_vals, pub_vals) -> list of ints:
        the same constraints on scalar ints (verifier, at query points).
      public_columns() -> list of length-n int columns known to both sides
        (e.g. the Pedersen constant-point tables). They are low-degree-
        extended like trace columns but NOT committed: the verifier
        evaluates their interpolants itself at each query point.
      boundary() -> list of (column, row, value) assertions.
    """

    n_columns: int = 1
    transition_degree: int = 1

    # True when the TRACED constraint evaluation uses no per-instance
    # state (all instance data enters as traced inputs / challenges /
    # public columns): the composition program can then be cached
    # module-wide by (class, geometry), so a fresh prover for a new
    # batch reuses the jitted callable instead of re-tracing — which
    # through a remote-TPU tunnel re-loads a multi-MB executable at
    # ~1 MB/s per prove. DSL AIRs are fingerprinted by their expr trees
    # instead and need not set this.
    composition_static: bool = False

    # --- optional second (interaction) trace phase -------------------------
    # Randomized arguments (memory permutations, lookups) need columns built
    # AFTER the main trace is committed, from verifier randomness. The prover
    # commits the main trace, draws `n_interaction_challenges` field elements
    # from the channel, calls `build_interaction`, and commits the result in a
    # second Merkle tree. Constraints then see the concatenated column list
    # [main..., interaction...] plus the challenges.
    n_interaction_columns: int = 0
    n_interaction_challenges: int = 0

    def build_interaction(
        self, main_columns: Sequence[Sequence[int]], challenges: List[int]
    ) -> List[List[int]]:
        return []

    # Derived challenges: values both sides compute from the drawn
    # challenges plus the PUBLIC inputs (e.g. the logUp sum of a public
    # lookup table at the drawn point). They ride the challenge vector into
    # the constraints, so a lookup argument can close against a public
    # table without the prover exposing (and the transcript re-absorbing)
    # any extra value: the verifier recomputes them itself.
    n_derived_challenges: int = 0

    def derived_challenges(self, challenges: List[int]) -> List[int]:
        return []

    def transition_divisors(self):
        """Per-constraint divisor tags, or None for all-'trans'.

        'trans': constraint holds on rows 0..n-2 (the usual state-transition
          divisor (x^n - 1)/(x - g^{n-1}); the wraparound row is exempt).
        'all': constraint holds on every row cyclically (divisor x^n - 1;
          cur->nxt references wrap from the last row to row 0 — used by
          grand-product columns so the running product closes the cycle).
        """
        return None

    def eval_transitions(self, f, cur, nxt, pub) -> List[jnp.ndarray]:
        raise NotImplementedError

    def transition_exprs_host(
        self, cur_vals: List[int], nxt_vals: List[int], pub_vals: List[int]
    ) -> List[int]:
        raise NotImplementedError

    # Challenge-aware variants (the framework always calls these; AIRs
    # without an interaction phase just inherit the delegation).
    def eval_transitions_chal(self, f, cur, nxt, pub, chal) -> List[jnp.ndarray]:
        return self.eval_transitions(f, cur, nxt, pub)

    def transition_exprs_host_chal(
        self, cur_vals, nxt_vals, pub_vals, chal_vals
    ) -> List[int]:
        return self.transition_exprs_host(cur_vals, nxt_vals, pub_vals)

    def public_columns(self) -> List[List[int]]:
        return []

    def boundary(self) -> List[Tuple[int, int, int]]:
        return []

    def public_inputs(self) -> List[int]:
        """Extra public values bound into the Fiat-Shamir transcript.

        The framework always binds the geometry and boundary assertions;
        AIRs with additional public claims (e.g. the hashes a Pedersen
        builtin batch asserts) list them here so a proof cannot be replayed
        against different public inputs.
        """
        return []


import contextlib


_MONT_MODE_LOCK = __import__("threading").Lock()
_MONT_MODE_DEPTH = 0


@contextlib.contextmanager
def _fused_mont_mode():
    """Trace fused-prover programs under the 'columns' mont-mul lowering.

    Through a remote-TPU tunnel the prover's wall time is dominated by
    compiling (first ever run) and then LOADING cached executables, both
    of which scale with code size: the unrolled CIOS lowering produced a
    ~50 MB commit executable. The columns lowering emits ~5x less HLO for
    the same arithmetic at a modest runtime cost — the right trade for
    every program the fused prover traces. An explicit STARK_TPU_MONT_MUL
    (or a CPU backend, where tests pick their own mode) is respected.

    Re-entrant and thread-safe (refcounted): concurrent proves (the
    thread-parallel batch bundle) must not pop the env var while a
    sibling is still tracing under it.
    """
    import jax

    global _MONT_MODE_DEPTH
    if jax.default_backend() == "cpu":
        yield
        return
    with _MONT_MODE_LOCK:
        user_set = _MONT_MODE_DEPTH == 0 and bool(os.environ.get("STARK_TPU_MONT_MUL"))
        if not user_set:
            _MONT_MODE_DEPTH += 1
            os.environ["STARK_TPU_MONT_MUL"] = "columns"
    if user_set:
        yield
        return
    try:
        yield
    finally:
        with _MONT_MODE_LOCK:
            _MONT_MODE_DEPTH -= 1
            if _MONT_MODE_DEPTH == 0:
                os.environ.pop("STARK_TPU_MONT_MUL", None)


def stark_security_bits(blowup: int, n_queries: int, grinding_bits: int = 0) -> int:
    """Conjectured soundness level of a proof configuration, in bits.

    Standard FRI accounting: each distinct query contributes log2(blowup)
    bits (the codeword is within unique-decoding distance of at most one
    low-degree polynomial), plus the grinding work; capped by the
    Fiat-Shamir channel's 252-bit Pedersen sponge (~126-bit collision
    level). The default prover configuration (blowup=8, n_queries=16)
    gives 48 bits; production geometries should use e.g. blowup=16,
    n_queries=24, grinding_bits=20 for ~116 bits.
    """
    import math

    return min(int(n_queries * math.log2(blowup)) + grinding_bits, 126)


@dataclass
class StarkProof:
    trace_root: int
    trace_length: int
    blowup: int
    n_queries: int
    grinding_bits: int
    # Composition commitment (transition_degree parts of degree < n).
    comp_root: int
    # Out-of-domain openings at z (drawn after all commitments).
    ood_trace: List[int]  # T_j(z), main then interaction columns
    ood_trace_next: List[int]  # T_j(g z)
    ood_comp: List[int]  # H_i(z)
    fri: FriProof
    # per query: (column values at q, auth path at q)
    trace_openings: List[Tuple[List[int], List[int]]]
    comp_openings: List[Tuple[List[int], List[int]]]
    # interaction phase (zero/empty when the AIR has no interaction columns)
    inter_root: int = 0
    inter_openings: Optional[List[Tuple[List[int], List[int]]]] = None

    @property
    def security_bits(self) -> int:
        return stark_security_bits(self.blowup, self.n_queries, self.grinding_bits)


def _row_leaves(columns_lde: List[List[int]]) -> List[int]:
    """Leaf per LDE row: fold the row's column values in a Pedersen chain."""
    n = len(columns_lde[0])
    acc = [0] * n
    for col in columns_lde:
        acc = pedersen_hash_ints(list(zip(acc, col)))
    return acc


# Module-level composition-program cache: {structural fingerprint -> jitted
# callable}. Populated only for DSL-built AIRs (whose traced computation is
# fully determined by their expr trees + geometry); per-instance fallback
# for hand-written AIRs. Keeps one callable alive per distinct constraint
# system — bounded and small.
_COMPOSITION_PROGRAMS: dict = {}


class StarkProver:
    def __init__(
        self,
        air: Air,
        blowup: int = 8,
        n_queries: int = 16,
        sharding=None,
        grinding_bits: int = 0,
    ):
        """sharding: optional jax.sharding.NamedSharding whose spec shards
        the LDE-row axis (e.g. NamedSharding(mesh, P(None, "dp", None))).
        The composition program's inputs are committed to it, so XLA
        partitions the whole constraint-eval/quotient stage across the
        mesh (trace sharded by rows, SURVEY.md section 2.5)."""
        assert blowup >= max(2, air.transition_degree), (
            "composition split needs blowup >= transition_degree"
        )
        self.air = air
        self.blowup = blowup
        self.n_queries = n_queries
        self.grinding_bits = grinding_bits
        self.sharding = sharding
        self.f = stark_prime_field()
        self._programs = {}

    def _composition_program(
        self, n: int, big: int, n_pub: int, n_boundary: int, n_chal: int = 0
    ):
        """One jit-compiled program for constraint eval + quotients + boundary.

        The whole composition stage runs as a single device program (vs.
        hundreds of eager per-op dispatches, which dominate wall time on CPU
        and are prohibitive through a remote-TPU tunnel). Boundary columns,
        points, values and interaction challenges are traced inputs, so the
        program is cached purely by shape and reused across proofs of the
        same AIR geometry.

        DSL-built AIRs additionally hit a MODULE-level cache keyed by the
        structural fingerprint of their constraint trees (Expr nodes are
        hash-consed, so the expr tuple IS the fingerprint): a fresh
        StarkProver for a new batch reuses the already-jitted callable
        instead of re-tracing — which, through a remote-TPU tunnel, would
        re-LOAD the multi-MB composition executable at ~1 MB/s on every
        prove (measured 30-80 s per business AIR, the whole steady-state
        cost of a batch bundle).
        """
        key = (n, big, n_pub, n_boundary, n_chal)
        gkey = None
        exprs = getattr(self.air, "_exprs", None)
        static = getattr(self.air, "composition_static", False)
        if self.sharding is None and (exprs is not None or static):
            div = self.air.transition_divisors()
            gkey = (
                type(self.air).__qualname__,
                tuple(exprs) if exprs is not None else "static",
                tuple(div) if div is not None else None,
                self.blowup,
                os.environ.get("STARK_TPU_MONT_MUL", ""),
            ) + key
            cached = _COMPOSITION_PROGRAMS.get(gkey)
            if cached is not None:
                if os.environ.get("STARK_TIMING"):
                    import sys as _sys

                    print(
                        f"[comp-cache] hit {type(self.air).__name__} {key}",
                        file=_sys.stderr,
                    )
                return cached
        if key in self._programs:
            return self._programs[key]
        if os.environ.get("STARK_TIMING"):
            import sys as _sys

            print(
                f"[comp-cache] build {type(self.air).__name__} {key} "
                f"(global={'yes' if gkey is not None else 'no'})",
                file=_sys.stderr,
            )

        import jax

        f = self.f
        air = self.air
        blowup = self.blowup
        g_last = pow(root_of_unity(n), n - 1, FIELD_PRIME)
        divisors = air.transition_divisors()

        @jax.jit
        def run(cur_m, pub_m, chal_m, t_alphas_m, b_cols, b_xrow_m, b_val_m, b_alphas_m):
            nxt_m = jnp.roll(cur_m, -blowup, axis=1)
            cvals = air.eval_transitions_chal(
                f, list(cur_m), list(nxt_m), list(pub_m), list(chal_m)
            )

            xs_n = _coset_power_table(f, big, FIELD_GEN, n)
            one_m = jnp.broadcast_to(
                jnp.asarray(f.pack((1 << 252) % FIELD_PRIME)), xs_n.shape
            )
            zden = f.sub(xs_n, one_m)  # x^n - 1
            xs = _coset_power_table(f, big, FIELD_GEN, 1)
            glast_m = jnp.broadcast_to(
                jnp.asarray(f.pack((g_last << 252) % FIELD_PRIME)), xs.shape
            )
            # 1/(x^n - 1): the cyclic ('all') divisor.
            inv_z_all = f.batch_inv(zden, group=min(64, big))
            # 1/Z = (x - g_last) / (x^n - 1): the transition divisor.
            inv_z = f.mont_mul(f.sub(xs, glast_m), inv_z_all)

            comp = jnp.zeros((big, N_LIMBS), dtype=jnp.int32)
            for k, cval in enumerate(cvals):
                alpha = jnp.broadcast_to(t_alphas_m[k], cval.shape)
                div = inv_z if divisors is None or divisors[k] == "trans" else inv_z_all
                comp = f.add(comp, f.mont_mul(alpha, f.mont_mul(cval, div)))

            if n_boundary:
                sel = cur_m[b_cols]  # (n_b, big, L)
                numer = f.sub(sel, jnp.broadcast_to(b_val_m[:, None, :], sel.shape))
                denom = f.sub(
                    jnp.broadcast_to(xs[None], sel.shape),
                    jnp.broadcast_to(b_xrow_m[:, None, :], sel.shape),
                )
                inv_d = f.batch_inv(
                    denom.reshape(n_boundary * big, N_LIMBS), group=min(64, big)
                ).reshape(n_boundary, big, N_LIMBS)
                terms = f.mont_mul(
                    jnp.broadcast_to(b_alphas_m[:, None, :], sel.shape),
                    f.mont_mul(numer, inv_d),
                )
                for i in range(n_boundary):
                    comp = f.add(comp, terms[i])
            return f.from_mont(comp)

        self._programs[key] = run
        if gkey is not None:
            _COMPOSITION_PROGRAMS[gkey] = run
        return run

    def _use_fused(self) -> bool:
        """Device-resident prover path selection.

        The fused path (ops/fused_prover.py) collapses commitment + FRI
        into a handful of device programs — the right shape through a
        remote-TPU tunnel where every dispatch costs ~25 ms. On CPU the
        host path wins (native-library hashing, no dispatch latency).
        Proofs from both paths are bit-identical (tests/test_fused_prover).
        """
        mode = os.environ.get("STARK_PROVER_FUSED", "auto")
        if mode in ("0", "1"):
            return mode == "1"
        if self.sharding is not None:
            return False  # sharded composition stays on the host-driven path
        import jax

        return jax.default_backend() != "cpu"

    def prove(self, trace_columns: Sequence[Sequence[int]]) -> StarkProof:
        if self._use_fused():
            with _fused_mont_mode():
                return self._prove_fused(trace_columns)
        return self._prove_host(trace_columns)

    def _prove_fused(self, trace_columns: Sequence[Sequence[int]]) -> StarkProof:
        """Device-resident prove: identical proof bytes to _prove_host.

        Every polynomial-sized intermediate (LDEs, tree levels, FRI
        layers) stays on the device; the host sees only roots, OOD values
        and the query-time openings (gathered in one dispatch per buffer).
        """
        import jax

        from stark_perpetual_tpu.ops.fused_prover import (
            commit_columns,
            fri_fused,
            gather_rows,
        )
        from stark_perpetual_tpu.ops.fri import _coset_interpolate

        f = self.f
        air = self.air
        n = len(trace_columns[0])
        assert n & (n - 1) == 0
        big = n * self.blowup
        ntt = ntt_ops()

        # Optional phase-timing (STARK_TIMING=1): wall at each blocking
        # point, printed to stderr — the tunnel cost model depends on
        # which fetches dominate.
        import sys as _sys
        import time as _time

        _marks = [] if os.environ.get("STARK_TIMING") else None

        def _t(label):
            if _marks is not None:
                _marks.append((label, _time.time()))

        _t("start")

        # 1. Interpolate + LDE (device-resident).
        cols = jnp.asarray(np.stack([f.pack(list(col)) for col in trace_columns]))
        coeffs = ntt.ntt(cols, inverse=True)
        ldes_all = ntt.lde(coeffs, self.blowup, shift=FIELD_GEN)
        _t("pack+lde_dispatch")

        # 2. Commit the trace: row-leaf chain + all tree levels, one program.
        trace_tree, bad_t = commit_columns(ldes_all)
        trace_root = trace_tree.root
        _t("trace_commit")

        channel = Channel()
        channel.absorb(
            _public_input_hash(
                air, n, self.blowup, self.n_queries, self.grinding_bits, air.boundary()
            )
        )
        channel.absorb(trace_root)

        # 2b. Interaction phase.
        challenges = [channel.challenge() for _ in range(air.n_interaction_challenges)]
        challenges = challenges + list(air.derived_challenges(challenges))
        inter_tree = None
        inter_root = 0
        icoeffs = None
        if air.n_interaction_columns:
            inter_cols = air.build_interaction(trace_columns, challenges)
            assert len(inter_cols) == air.n_interaction_columns
            icols = jnp.asarray(np.stack([f.pack(list(col)) for col in inter_cols]))
            icoeffs = ntt.ntt(icols, inverse=True)
            inter_ldes_all = ntt.lde(icoeffs, self.blowup, shift=FIELD_GEN)
            inter_tree, bad_i = commit_columns(inter_ldes_all)
            inter_root = inter_tree.root
            channel.absorb(inter_root)
            ldes_cat = jnp.concatenate([ldes_all, inter_ldes_all], axis=0)
        else:
            bad_i = bad_t
            ldes_cat = ldes_all
        _t("interaction")

        # 3-5. Composition (same jitted program as the host path).
        pub_cols = air.public_columns()
        cur_m = f.to_mont(ldes_cat)
        if pub_cols:
            pcols = jnp.asarray(np.stack([f.pack(list(col)) for col in pub_cols]))
            pub_ldes_all = ntt.lde(
                ntt.ntt(pcols, inverse=True), self.blowup, shift=FIELD_GEN
            )
            pub_m = f.to_mont(pub_ldes_all)
        else:
            pub_m = jnp.zeros((0, big, N_LIMBS), dtype=jnp.int32)

        n_total_cols = air.n_columns + air.n_interaction_columns
        n_transitions = len(
            air.transition_exprs_host_chal(
                [0] * n_total_cols,
                [0] * n_total_cols,
                [0] * len(pub_cols),
                [1] * len(challenges),
            )
        )
        t_alphas = [channel.challenge() for _ in range(n_transitions)]
        boundary = air.boundary()
        b_alphas = [channel.challenge() for _ in boundary]

        def mont_pack(vals):
            return jnp.asarray(
                np.stack([f.pack((v << 252) % FIELD_PRIME) for v in vals])
            )

        w_n = root_of_unity(n)
        if boundary:
            b_cols = jnp.asarray(np.array([c for c, _r, _v in boundary], dtype=np.int32))
            b_xrow_m = mont_pack([pow(w_n, r, FIELD_PRIME) for _c, r, _v in boundary])
            b_val_m = mont_pack([v for _c, _r, v in boundary])
            b_alphas_m = mont_pack(b_alphas)
        else:
            b_cols = jnp.zeros((0,), dtype=jnp.int32)
            b_xrow_m = b_val_m = b_alphas_m = jnp.zeros((0, N_LIMBS), dtype=jnp.int32)
        t_alphas_m = (
            mont_pack(t_alphas) if t_alphas else jnp.zeros((0, N_LIMBS), dtype=jnp.int32)
        )
        chal_m = (
            mont_pack(challenges)
            if challenges
            else jnp.zeros((0, N_LIMBS), dtype=jnp.int32)
        )

        program = self._composition_program(
            n, big, len(pub_cols), len(boundary), len(challenges)
        )
        comp_std = program(
            cur_m, pub_m, chal_m, t_alphas_m, b_cols, b_xrow_m, b_val_m, b_alphas_m
        )

        # 6. Composition split + commit (device-resident).
        from stark_perpetual_tpu.ops.fri import _geom_program

        n_parts = max(1, air.transition_degree - 1)
        one_m = jnp.asarray(f.pack((1 << 252) % FIELD_PRIME))
        inv_off = pow(FIELD_GEN, FIELD_PRIME - 2, FIELD_PRIME)
        invoff_tab = _geom_program(big)(
            jnp.asarray(f.pack((inv_off << 252) % FIELD_PRIME)), one_m
        )
        comp_coeffs = _apply_powers_program(big)(
            ntt.ntt(comp_std, inverse=True), invoff_tab
        )
        parts_std = comp_coeffs[: n_parts * n].reshape(n_parts, n, N_LIMBS)
        h_ldes = ntt.lde(parts_std, self.blowup, shift=FIELD_GEN)
        comp_tree, bad_c = commit_columns(h_ldes)
        comp_root = comp_tree.root
        channel.absorb(comp_root)
        _t("composition+commit")

        # 7. Out-of-domain openings.
        z = channel.challenge()
        gz = z * w_n % FIELD_PRIME
        coeffs_all = (
            jnp.concatenate([coeffs, icoeffs], axis=0)
            if air.n_interaction_columns
            else coeffs
        )
        n_total = air.n_columns + air.n_interaction_columns
        zpow = _geom_program(n)(jnp.asarray(f.pack((z << 252) % FIELD_PRIME)), one_m)
        gzpow = _geom_program(n)(jnp.asarray(f.pack((gz << 252) % FIELD_PRIME)), one_m)
        eval_t = _eval_at_point_program(n_total, n)
        ood_trace = [int(v) for v in unpack_ints(np.asarray(eval_t(coeffs_all, zpow)))]
        ood_trace_next = [
            int(v) for v in unpack_ints(np.asarray(eval_t(coeffs_all, gzpow)))
        ]
        eval_h = _eval_at_point_program(n_parts, n)
        ood_comp = [int(v) for v in unpack_ints(np.asarray(eval_h(parts_std, zpow)))]
        for v in ood_trace + ood_trace_next + ood_comp:
            channel.absorb(v)
        _t("ood")

        # 8. DEEP quotient (device) + fused FRI (device).
        g1 = [channel.challenge() for _ in range(n_total)]
        g2 = [channel.challenge() for _ in range(n_total)]
        g3 = [channel.challenge() for _ in range(n_parts)]
        deep_std = _deep_program(n_total, n_parts, big)(
            ldes_cat,
            h_ldes,
            jnp.asarray(f.pack((z << 252) % FIELD_PRIME)),
            jnp.asarray(f.pack((gz << 252) % FIELD_PRIME)),
            mont_pack(ood_trace),
            mont_pack(ood_trace_next),
            mont_pack(ood_comp),
            mont_pack(g1),
            mont_pack(g2),
            mont_pack(g3),
        )
        final_size = 4
        layers, layer_roots, final_evals, fri_state, bad_f = fri_fused(
            deep_std, channel.state, FIELD_GEN, final_size
        )
        n_layers = len(layers.trees)
        final_offset = FIELD_GEN
        for _ in range(n_layers):
            final_offset = final_offset * final_offset % FIELD_PRIME
        final_coeffs = _coset_interpolate(final_evals, final_offset)
        fri_channel = Channel(fri_state)
        for c in final_coeffs:
            fri_channel.absorb(c)
        pow_nonce = fri_channel.grind(self.grinding_bits)
        indices = fri_channel.query_indices(self.n_queries, big)
        _t("deep+fri")

        # Poison check: exceptional EC additions are ~2^-250 per hash; the
        # OR of every commit's flag (trace, interaction, composition, FRI)
        # guards the whole device hashing pipeline with one fetch.
        assert not any(
            bool(np.asarray(flag)) for flag in (bad_t, bad_i, bad_c, bad_f)
        ), "Unhashable input."

        # 9. Query openings: one gather dispatch per device buffer.
        lde_flat = ldes_cat.reshape(-1, N_LIMBS)
        h_flat = h_ldes.reshape(-1, N_LIMBS)

        tval_idx = [c * big + q for q in indices for c in range(air.n_columns)]
        tpath_idx = [i for q in indices for i in trace_tree.path_indices(q)]
        hval_idx = [c * big + q for q in indices for c in range(n_parts)]
        hpath_idx = [i for q in indices for i in comp_tree.path_indices(q)]
        tvals = gather_rows(lde_flat, tval_idx)
        tpaths = gather_rows(trace_tree.buf, tpath_idx)
        hvals = gather_rows(h_flat, hval_idx)
        hpaths = gather_rows(comp_tree.buf, hpath_idx)

        n_q = len(indices)
        depth_t = trace_tree.n_levels - 1
        openings = []
        comp_openings = []
        for k, q in enumerate(indices):
            openings.append(
                (
                    tvals[k * air.n_columns : (k + 1) * air.n_columns],
                    tpaths[k * depth_t : (k + 1) * depth_t],
                )
            )
            comp_openings.append(
                (
                    hvals[k * n_parts : (k + 1) * n_parts],
                    hpaths[k * depth_t : (k + 1) * depth_t],
                )
            )

        inter_openings = None
        if air.n_interaction_columns:
            inter_flat = inter_ldes_all.reshape(-1, N_LIMBS)
            ival_idx = [
                c * big + q for q in indices for c in range(air.n_interaction_columns)
            ]
            ipath_idx = [i for q in indices for i in inter_tree.path_indices(q)]
            ivals = gather_rows(inter_flat, ival_idx)
            ipaths = gather_rows(inter_tree.buf, ipath_idx)
            inter_openings = [
                (
                    ivals[
                        k * air.n_interaction_columns : (k + 1)
                        * air.n_interaction_columns
                    ],
                    ipaths[k * depth_t : (k + 1) * depth_t],
                )
                for k in range(n_q)
            ]

        # FRI query openings: leaf values + both paths per layer, all from
        # the single fused layer buffer.
        fri_idx: List[int] = []
        spans = []  # (per query, per layer) slices into fri_idx
        for q in indices:
            idx = q
            for tree in layers.trees:
                half = tree.n_leaves // 2
                i = idx % half
                j = i + half
                start = len(fri_idx)
                fri_idx.append(tree.leaf_index(i))
                fri_idx.append(tree.leaf_index(j))
                fri_idx.extend(tree.path_indices(i))
                fri_idx.extend(tree.path_indices(j))
                spans.append((start, tree.n_levels - 1))
                idx = i
        fri_vals = gather_rows(layers.buf, fri_idx)
        queries = []
        si = 0
        for q in indices:
            per_layer = []
            for tree in layers.trees:
                start, depth = spans[si]
                si += 1
                fx = fri_vals[start]
                fmx = fri_vals[start + 1]
                path_x = fri_vals[start + 2 : start + 2 + depth]
                path_mx = fri_vals[start + 2 + depth : start + 2 + 2 * depth]
                per_layer.append((fx, fmx, path_x, path_mx))
            queries.append(per_layer)

        _t("query_gathers")
        if _marks is not None:
            parts = ", ".join(
                f"{lbl}={_marks[i + 1][1] - _marks[i][1]:.2f}s"
                for i, (lbl, _ts) in enumerate(_marks[1:])
                for lbl in [_marks[i + 1][0]]
            )
            print(
                f"[stark-timing] {type(air).__name__} n={n} big={big}: {parts} "
                f"(total {_marks[-1][1] - _marks[0][1]:.2f}s)",
                file=_sys.stderr,
            )

        fri_proof = FriProof(
            layer_roots=layer_roots,
            final_coeffs=final_coeffs,
            queries=queries,
            domain_size=big,
            offset=FIELD_GEN,
            indices=indices,
            pow_nonce=pow_nonce,
        )

        return StarkProof(
            trace_root=trace_root,
            trace_length=n,
            blowup=self.blowup,
            n_queries=self.n_queries,
            grinding_bits=self.grinding_bits,
            comp_root=comp_root,
            ood_trace=ood_trace,
            ood_trace_next=ood_trace_next,
            ood_comp=ood_comp,
            fri=fri_proof,
            trace_openings=openings,
            comp_openings=comp_openings,
            inter_root=inter_root,
            inter_openings=inter_openings,
        )

    def _prove_host(self, trace_columns: Sequence[Sequence[int]]) -> StarkProof:
        f = self.f
        air = self.air
        n = len(trace_columns[0])
        assert n & (n - 1) == 0
        big = n * self.blowup
        ntt = ntt_ops()

        # 1. Interpolate and low-degree-extend every column onto the coset
        # (columns stacked: one INTT dispatch + one LDE dispatch for the
        # whole trace).
        cols = jnp.asarray(np.stack([f.pack(list(col)) for col in trace_columns]))
        coeffs = ntt.ntt(cols, inverse=True)
        ldes_all = np.asarray(ntt.lde(coeffs, self.blowup, shift=FIELD_GEN))
        ldes = [ldes_all[i] for i in range(len(trace_columns))]
        lde_ints = [[int(v) for v in unpack_ints(l)] for l in ldes]

        # 2. Commit the trace (row leaves over all columns).
        leaves = _row_leaves(lde_ints)
        leaf_limbs = f.pack(leaves)
        trace_root, trace_levels = dense_commit_device(leaf_limbs)

        # The transcript starts from the public inputs: geometry, boundary
        # assertions and AIR-specific claims. A proof replayed against
        # different public inputs derives different challenges and dies.
        channel = Channel()
        channel.absorb(
            _public_input_hash(
                air, n, self.blowup, self.n_queries, self.grinding_bits, air.boundary()
            )
        )
        channel.absorb(trace_root)

        # 2b. Interaction phase: draw randomness, build + commit the second
        # trace (grand-product/permutation columns). Derived challenges are
        # deterministic functions of the drawn ones + public inputs, so they
        # need no transcript absorption of their own.
        challenges = [channel.challenge() for _ in range(air.n_interaction_challenges)]
        challenges = challenges + list(air.derived_challenges(challenges))
        inter_lde_ints: List[List[int]] = []
        inter_levels = None
        inter_root = 0
        if air.n_interaction_columns:
            inter_cols = air.build_interaction(trace_columns, challenges)
            assert len(inter_cols) == air.n_interaction_columns
            icols = jnp.asarray(np.stack([f.pack(list(col)) for col in inter_cols]))
            icoeffs = ntt.ntt(icols, inverse=True)
            inter_ldes_all = np.asarray(
                ntt.lde(icoeffs, self.blowup, shift=FIELD_GEN)
            )
            inter_lde_ints = [
                [int(v) for v in unpack_ints(inter_ldes_all[i])]
                for i in range(len(inter_cols))
            ]
            inter_root, inter_levels = dense_commit_device(
                f.pack(_row_leaves(inter_lde_ints))
            )
            channel.absorb(inter_root)
            ldes_all = np.concatenate([ldes_all, inter_ldes_all], axis=0)
            lde_ints = lde_ints + inter_lde_ints

        # 3-5. Constraint evaluation, vanishing-quotient and boundary
        # quotients as ONE jitted device program (cached by shape).
        # Public columns ride along uncommitted: the verifier re-evaluates
        # their interpolants, so only the trace columns need Merkle openings.
        pub_cols = air.public_columns()
        cur_m = f.to_mont(jnp.asarray(ldes_all))
        if pub_cols:
            pcols = jnp.asarray(np.stack([f.pack(list(col)) for col in pub_cols]))
            pub_ldes_all = ntt.lde(ntt.ntt(pcols, inverse=True), self.blowup, shift=FIELD_GEN)
            pub_m = f.to_mont(pub_ldes_all)
        else:
            pub_m = jnp.zeros((0, big, N_LIMBS), dtype=jnp.int32)

        # Challenge order (must match verify_stark): transition alphas first,
        # then one alpha per boundary assertion.
        n_total_cols = air.n_columns + air.n_interaction_columns
        n_transitions = len(
            air.transition_exprs_host_chal(
                [0] * n_total_cols, [0] * n_total_cols, [0] * len(pub_cols), [1] * len(challenges)
            )
        )
        t_alphas = [channel.challenge() for _ in range(n_transitions)]
        boundary = air.boundary()
        b_alphas = [channel.challenge() for _ in boundary]

        def mont_pack(vals):
            return jnp.asarray(np.stack([f.pack((v << 252) % FIELD_PRIME) for v in vals]))

        w_n = root_of_unity(n)
        if boundary:
            b_cols = jnp.asarray(np.array([c for c, _r, _v in boundary], dtype=np.int32))
            b_xrow_m = mont_pack([pow(w_n, r, FIELD_PRIME) for _c, r, _v in boundary])
            b_val_m = mont_pack([v for _c, _r, v in boundary])
            b_alphas_m = mont_pack(b_alphas)
        else:
            b_cols = jnp.zeros((0,), dtype=jnp.int32)
            b_xrow_m = b_val_m = b_alphas_m = jnp.zeros((0, N_LIMBS), dtype=jnp.int32)
        t_alphas_m = (
            mont_pack(t_alphas)
            if t_alphas
            else jnp.zeros((0, N_LIMBS), dtype=jnp.int32)
        )
        chal_m = (
            mont_pack(challenges)
            if challenges
            else jnp.zeros((0, N_LIMBS), dtype=jnp.int32)
        )

        if self.sharding is not None:
            import jax

            cur_m = jax.device_put(cur_m, self.sharding)
            if pub_m.shape[0]:
                pub_m = jax.device_put(pub_m, self.sharding)

        program = self._composition_program(
            n, big, len(pub_cols), len(boundary), len(challenges)
        )
        comp_std = program(
            cur_m, pub_m, chal_m, t_alphas_m, b_cols, b_xrow_m, b_val_m, b_alphas_m
        )

        # 6. Split the composition polynomial into degree-<n parts and commit
        # them. comp has degree < n_parts * n (transitions divided by the
        # degree-(n-1) transition divisor; boundary quotients are < n).
        from stark_perpetual_tpu.ops.fri import _geom_program

        n_parts = max(1, air.transition_degree - 1)
        one_m = jnp.asarray(f.pack((1 << 252) % FIELD_PRIME))
        inv_off = pow(FIELD_GEN, FIELD_PRIME - 2, FIELD_PRIME)
        invoff_tab = _geom_program(big)(
            jnp.asarray(f.pack((inv_off << 252) % FIELD_PRIME)), one_m
        )
        comp_coeffs = _apply_powers_program(big)(
            ntt.ntt(comp_std, inverse=True), invoff_tab
        )
        # For an honest trace the composition is a polynomial of degree
        # < n_parts * n and the tail coefficients are zero. An invalid trace
        # makes the composition rational: truncating here is exactly what a
        # cheating prover could do, and the verifier's out-of-domain identity
        # check rejects it (tested by test_stark_rejects_invalid_trace).
        parts_std = comp_coeffs[: n_parts * n].reshape(n_parts, n, N_LIMBS)
        h_ldes = np.asarray(ntt.lde(parts_std, self.blowup, shift=FIELD_GEN))
        h_lde_ints = [
            [int(v) for v in unpack_ints(h_ldes[i])] for i in range(n_parts)
        ]
        comp_root, comp_levels = dense_commit_device(f.pack(_row_leaves(h_lde_ints)))
        channel.absorb(comp_root)

        # 7. Out-of-domain sampling: open every committed polynomial at z
        # (and the trace also at g z), binding the composition identity to
        # one random point.
        z = channel.challenge()
        w_n_val = root_of_unity(n)
        gz = z * w_n_val % FIELD_PRIME
        if air.n_interaction_columns:
            coeffs_all = jnp.concatenate([coeffs, icoeffs], axis=0)
        else:
            coeffs_all = coeffs
        n_total = air.n_columns + air.n_interaction_columns
        zpow = _geom_program(n)(jnp.asarray(f.pack((z << 252) % FIELD_PRIME)), one_m)
        gzpow = _geom_program(n)(jnp.asarray(f.pack((gz << 252) % FIELD_PRIME)), one_m)
        eval_t = _eval_at_point_program(n_total, n)
        ood_trace = [int(v) for v in unpack_ints(np.asarray(eval_t(coeffs_all, zpow)))]
        ood_trace_next = [
            int(v) for v in unpack_ints(np.asarray(eval_t(coeffs_all, gzpow)))
        ]
        eval_h = _eval_at_point_program(n_parts, n)
        ood_comp = [int(v) for v in unpack_ints(np.asarray(eval_h(parts_std, zpow)))]
        for v in ood_trace + ood_trace_next + ood_comp:
            channel.absorb(v)

        # 8. DEEP quotient codeword, then FRI on it.
        g1 = [channel.challenge() for _ in range(n_total)]
        g2 = [channel.challenge() for _ in range(n_total)]
        g3 = [channel.challenge() for _ in range(n_parts)]
        deep_std = _deep_program(n_total, n_parts, big)(
            jnp.asarray(ldes_all),
            jnp.asarray(h_ldes),
            jnp.asarray(f.pack((z << 252) % FIELD_PRIME)),
            jnp.asarray(f.pack((gz << 252) % FIELD_PRIME)),
            mont_pack(ood_trace),
            mont_pack(ood_trace_next),
            mont_pack(ood_comp),
            mont_pack(g1),
            mont_pack(g2),
            mont_pack(g3),
        )
        deep_ints = [int(v) for v in unpack_ints(np.asarray(deep_std))]
        fri_proof = fri_commit(
            deep_ints,
            offset=FIELD_GEN,
            final_size=4,
            n_queries=self.n_queries,
            channel_seed=channel.state,
            grinding_bits=self.grinding_bits,
        )

        # 9. Open the trace / interaction / composition trees at the FRI
        # query points (single-point openings: the DEEP quotient replaced
        # the next-row consistency checks).
        openings = []
        comp_openings = []
        inter_openings = [] if air.n_interaction_columns else None
        for q in fri_proof.indices:
            vals_q = [lde_ints[c][q] for c in range(air.n_columns)]
            openings.append((vals_q, auth_path_from_levels(trace_levels, q)))
            hvals_q = [h_lde_ints[i][q] for i in range(n_parts)]
            comp_openings.append((hvals_q, auth_path_from_levels(comp_levels, q)))
            if air.n_interaction_columns:
                ivals_q = [
                    inter_lde_ints[c][q] for c in range(air.n_interaction_columns)
                ]
                inter_openings.append(
                    (ivals_q, auth_path_from_levels(inter_levels, q))
                )

        return StarkProof(
            trace_root=trace_root,
            trace_length=n,
            blowup=self.blowup,
            n_queries=self.n_queries,
            grinding_bits=self.grinding_bits,
            comp_root=comp_root,
            ood_trace=ood_trace,
            ood_trace_next=ood_trace_next,
            ood_comp=ood_comp,
            fri=fri_proof,
            trace_openings=openings,
            comp_openings=comp_openings,
            inter_root=inter_root,
            inter_openings=inter_openings,
        )


@functools.lru_cache(maxsize=None)
def _eval_at_point_program(c_count: int, n: int):
    """Evaluate c_count degree-<n polynomials at one point (device).

    Inputs: std-domain coefficients (C, n, 21) and Montgomery powers z^i
    (n, 21); output std-domain values (C, 21) via a log2(n) mod-add tree.
    """
    import jax

    f = stark_prime_field()

    @jax.jit
    def run(coeffs_std, powers_m):
        terms = f.mont_mul(
            f.to_mont(coeffs_std),
            jnp.broadcast_to(powers_m[None], (c_count, n, N_LIMBS)),
        )
        m = n
        while m > 1:
            terms = f.add(terms[:, : m // 2], terms[:, m // 2 : m])
            m //= 2
        return f.from_mont(terms[:, 0])

    return run


@functools.lru_cache(maxsize=None)
def _apply_powers_program(m: int):
    """Elementwise modular multiply by a Montgomery power table (device)."""
    import jax

    f = stark_prime_field()

    @jax.jit
    def run(vals_std, powers_m):
        return f.from_mont(f.mont_mul(f.to_mont(vals_std), powers_m))

    return run


@functools.lru_cache(maxsize=None)
def _deep_program(n_cols: int, n_parts: int, big: int):
    """The DEEP quotient codeword over the LDE domain, as one jit program."""
    import jax

    f = stark_prime_field()

    @jax.jit
    def run(t_ldes, h_ldes, z_m, gz_m, tz_m, tgz_m, hz_m, g1_m, g2_m, g3_m):
        xs = _coset_power_table(f, big, FIELD_GEN, 1)

        def comb(ldes_m, claims_m, gammas_m, count):
            acc = jnp.zeros((big, N_LIMBS), dtype=jnp.int32)
            for j in range(count):
                diff = f.sub(ldes_m[j], jnp.broadcast_to(claims_m[j], (big, N_LIMBS)))
                acc = f.add(
                    acc, f.mont_mul(jnp.broadcast_to(gammas_m[j], (big, N_LIMBS)), diff)
                )
            return acc

        t_m = f.to_mont(t_ldes)
        h_m = f.to_mont(h_ldes)
        s1 = comb(t_m, tz_m, g1_m, n_cols)
        s2 = comb(t_m, tgz_m, g2_m, n_cols)
        s3 = comb(h_m, hz_m, g3_m, n_parts)
        inv_xz = f.batch_inv(
            f.sub(xs, jnp.broadcast_to(z_m, (big, N_LIMBS))), group=min(64, big)
        )
        inv_xgz = f.batch_inv(
            f.sub(xs, jnp.broadcast_to(gz_m, (big, N_LIMBS))), group=min(64, big)
        )
        deep = f.add(f.mont_mul(f.add(s1, s3), inv_xz), f.mont_mul(s2, inv_xgz))
        return f.from_mont(deep)

    return run


def _public_input_hash(
    air: Air, n: int, blowup: int, n_queries: int, grinding_bits: int, boundary
) -> int:
    """Merkle hash binding the proof geometry + public inputs (transcript seed)."""
    items = [
        n,
        blowup,
        n_queries,
        grinding_bits,
        air.n_columns,
        air.n_interaction_columns,
        air.transition_degree,
        len(boundary),
    ]
    for col, row, value in boundary:
        items.extend((col, row, value % FIELD_PRIME))
    items.extend(v % FIELD_PRIME for v in air.public_inputs())
    items.append(len(items))
    size = 1 << max(3, (len(items) - 1).bit_length())
    items += [0] * (size - len(items))
    # Host-int tree (native-library hashing): the list is small, and keeping
    # it off the device avoids instantiating the standalone chunked-hash
    # program in processes that otherwise only run fused prover programs.
    vals = list(items)
    while len(vals) > 1:
        vals = pedersen_hash_ints(
            [(vals[i], vals[i + 1]) for i in range(0, len(vals), 2)]
        )
    return vals[0]


def _coset_power_table(f, size: int, offset: int, power: int) -> jnp.ndarray:
    """Montgomery limbs of (offset * w^i)^power for i < size (prefix scan)."""
    import jax

    w = root_of_unity(size)
    wp = pow(w, power, FIELD_PRIME)
    base = pow(offset, power, FIELD_PRIME)
    wp_m = jnp.broadcast_to(jnp.asarray(f.pack((wp << 252) % FIELD_PRIME)), (size, N_LIMBS))
    prefix = jax.lax.associative_scan(f.mont_mul, wp_m, axis=0)
    one = jnp.asarray(f.pack((1 << 252) % FIELD_PRIME))[None]
    powers = jnp.concatenate([one, prefix[:-1]], axis=0)
    base_m = jnp.broadcast_to(jnp.asarray(f.pack((base << 252) % FIELD_PRIME)), (size, N_LIMBS))
    return f.mont_mul(base_m, powers)


def verify_stark(
    air: Air,
    proof: StarkProof,
    claimed_boundary=None,
    min_security_bits: Optional[int] = None,
) -> bool:
    """DEEP-ALI verifier.

    Re-derives the transcript (public-input hash first), checks the
    composition identity at the out-of-domain point, verifies FRI on the
    DEEP quotient, and at every query recomputes the DEEP value from the
    committed trace/composition openings.
    """
    n = proof.trace_length
    big = n * proof.blowup
    n_total = air.n_columns + air.n_interaction_columns
    n_parts = max(1, air.transition_degree - 1)
    boundary = air.boundary() if claimed_boundary is None else claimed_boundary

    # Structural checks (the proof is adversarial input).
    if min_security_bits is not None and proof.security_bits < min_security_bits:
        return False
    n_q = len(proof.fri.queries)
    if proof.n_queries != n_q:
        return False
    if len(proof.trace_openings) != n_q or len(proof.comp_openings) != n_q:
        return False
    if len(proof.ood_trace) != n_total or len(proof.ood_trace_next) != n_total:
        return False
    if len(proof.ood_comp) != n_parts:
        return False
    if any(len(vals) != air.n_columns for vals, _path in proof.trace_openings):
        return False
    if any(len(vals) != n_parts for vals, _path in proof.comp_openings):
        return False

    channel = Channel()
    channel.absorb(
        _public_input_hash(
            air, n, proof.blowup, proof.n_queries, proof.grinding_bits, boundary
        )
    )
    channel.absorb(proof.trace_root)
    challenges = [channel.challenge() for _ in range(air.n_interaction_challenges)]
    challenges = challenges + list(air.derived_challenges(challenges))
    if air.n_interaction_columns:
        if proof.inter_openings is None or len(proof.inter_openings) != n_q:
            return False
        if any(
            len(vals) != air.n_interaction_columns
            for vals, _path in proof.inter_openings
        ):
            return False
        channel.absorb(proof.inter_root)

    # Public columns: interpolate once (host coefficients); the verifier
    # evaluates them itself — they are not part of any commitment.
    pub_cols = air.public_columns()
    if pub_cols:
        f = stark_prime_field()
        ntt = ntt_ops()
        with _fused_mont_mode():  # share the prover's cached INTT programs
            pub_coeffs = [
                [
                    int(v)
                    for v in unpack_ints(
                        np.asarray(ntt.ntt(f.pack(list(col)), inverse=True))
                    )
                ]
                for col in pub_cols
            ]
    else:
        pub_coeffs = []

    # Re-derive alphas in prover order.
    n_transitions = len(
        air.transition_exprs_host_chal(
            [0] * n_total, [0] * n_total, [0] * len(pub_cols), [1] * len(challenges)
        )
    )
    t_alphas = [channel.challenge() for _ in range(n_transitions)]
    b_alphas = [channel.challenge() for _ in boundary]

    channel.absorb(proof.comp_root)
    z = channel.challenge()
    w_n = root_of_unity(n)
    gz = z * w_n % FIELD_PRIME
    for v in proof.ood_trace + proof.ood_trace_next + proof.ood_comp:
        channel.absorb(v)
    g1 = [channel.challenge() for _ in range(n_total)]
    g2 = [channel.challenge() for _ in range(n_total)]
    g3 = [channel.challenge() for _ in range(n_parts)]

    # The out-of-domain composition identity: the committed H parts must
    # equal the alpha-combined constraint quotients at z.
    g_last = pow(w_n, n - 1, FIELD_PRIME)
    divisors = air.transition_divisors()
    inv_z_all = pow(
        (pow(z, n, FIELD_PRIME) - 1) % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME
    )
    inv_z = (z - g_last) % FIELD_PRIME * inv_z_all % FIELD_PRIME
    pub_z = [_horner(coeffs, z) for coeffs in pub_coeffs]
    comp_at_z = 0
    for k, (alpha, cval) in enumerate(
        zip(
            t_alphas,
            air.transition_exprs_host_chal(
                list(proof.ood_trace), list(proof.ood_trace_next), pub_z, challenges
            ),
        )
    ):
        div = inv_z if divisors is None or divisors[k] == "trans" else inv_z_all
        comp_at_z = (comp_at_z + alpha * cval % FIELD_PRIME * div) % FIELD_PRIME
    for alpha, (col, row, value) in zip(b_alphas, boundary):
        x_row = pow(w_n, row, FIELD_PRIME)
        inv = pow((z - x_row) % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
        comp_at_z = (
            comp_at_z
            + alpha * ((proof.ood_trace[col] - value) % FIELD_PRIME) % FIELD_PRIME * inv
        ) % FIELD_PRIME
    z_n = pow(z, n, FIELD_PRIME)
    h_at_z = 0
    for i in reversed(range(n_parts)):
        h_at_z = (h_at_z * z_n + proof.ood_comp[i]) % FIELD_PRIME
    if comp_at_z != h_at_z:
        return False

    # FRI on the DEEP quotient (degree < n).
    if not fri_verify(
        proof.fri,
        final_size=4,
        channel_seed=channel.state,
        degree_bound=n,
        grinding_bits=proof.grinding_bits,
    ):
        return False

    # Re-derive the query indices exactly as fri_verify does.
    fri_channel = Channel(channel.state)
    for root in proof.fri.layer_roots:
        fri_channel.absorb(root)
        fri_channel.challenge()
    for c in proof.fri.final_coeffs:
        fri_channel.absorb(c)
    if not fri_channel.check_grind(proof.grinding_bits, proof.fri.pow_nonce):
        return False
    indices = fri_channel.query_indices(n_q, big)

    w_big = root_of_unity(big)
    for qi, (q, (tvals, tpath), (hvals, hpath), per_layer) in enumerate(
        zip(indices, proof.trace_openings, proof.comp_openings, proof.fri.queries)
    ):
        if not verify_path(_fold_row(tvals), q, tpath, proof.trace_root):
            return False
        if not verify_path(_fold_row(hvals), q, hpath, proof.comp_root):
            return False
        t_all = list(tvals)
        if air.n_interaction_columns:
            ivals, ipath = proof.inter_openings[qi]
            if not verify_path(_fold_row(ivals), q, ipath, proof.inter_root):
                return False
            t_all += list(ivals)

        # Recompute the DEEP quotient at x_q from the opened values.
        x = FIELD_GEN * pow(w_big, q, FIELD_PRIME) % FIELD_PRIME
        inv_xz = pow((x - z) % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
        inv_xgz = pow((x - gz) % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
        s1 = 0
        s2 = 0
        for j in range(n_total):
            s1 = (s1 + g1[j] * ((t_all[j] - proof.ood_trace[j]) % FIELD_PRIME)) % FIELD_PRIME
            s2 = (s2 + g2[j] * ((t_all[j] - proof.ood_trace_next[j]) % FIELD_PRIME)) % FIELD_PRIME
        s3 = 0
        for i in range(n_parts):
            s3 = (s3 + g3[i] * ((hvals[i] - proof.ood_comp[i]) % FIELD_PRIME)) % FIELD_PRIME
        deep = ((s1 + s3) * inv_xz + s2 * inv_xgz) % FIELD_PRIME

        half = big // 2
        fx, fmx = per_layer[0][0], per_layer[0][1]
        observed = fx if q < half else fmx
        if observed != deep:
            return False
    return True


def _horner(coeffs: List[int], x: int) -> int:
    """Evaluate a coefficient-form polynomial at x (host, for public columns)."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % FIELD_PRIME
    return acc


def _fold_row(vals: List[int]) -> int:
    acc = 0
    for v in vals:
        acc = pedersen_hash_ints([(acc, v)])[0]
    return acc


# --- demo AIR --------------------------------------------------------------


class FibonacciAir(Air):
    """Two-column Fibonacci AIR: (a, b) -> (b, a + b); degree-1 transitions."""

    n_columns = 2
    transition_degree = 1

    def __init__(self, a0: int = 1, b0: int = 1, final_b: int = None, n_rows: int = None):
        self.a0, self.b0 = a0, b0
        self.final_b = final_b
        self.n_rows = n_rows

    def eval_transitions(self, f, cur, nxt, pub):
        c0 = f.sub(nxt[0], cur[1])  # a' - b
        c1 = f.sub(nxt[1], f.add(cur[0], cur[1]))  # b' - (a + b)
        return [c0, c1]

    def transition_exprs_host(self, cur_vals, nxt_vals, pub_vals=()):
        return [
            (nxt_vals[0] - cur_vals[1]) % FIELD_PRIME,
            (nxt_vals[1] - cur_vals[0] - cur_vals[1]) % FIELD_PRIME,
        ]

    def boundary(self):
        out = [(0, 0, self.a0), (1, 0, self.b0)]
        if self.final_b is not None and self.n_rows is not None:
            out.append((1, self.n_rows - 1, self.final_b))
        return out

    @staticmethod
    def trace(n_rows: int, a0: int = 1, b0: int = 1):
        a, b = [a0], [b0]
        for _ in range(n_rows - 1):
            a.append(b[-1])
            b.append((a[-2] + b[-1]) % FIELD_PRIME)
        return [a, b]
