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

Soundness notes: the composition uses one random alpha per constraint and
per-query trace-consistency checks against the committed trace; DEEP-ALI
sampling is left for a later round (documented gap).
"""

from dataclasses import dataclass
from typing import Callable, List, Sequence, Tuple

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


@dataclass
class StarkProof:
    trace_root: int
    trace_length: int
    blowup: int
    fri: FriProof
    # per query: (openings at q, openings at q_next, paths at q, paths at q_next)
    trace_openings: List[Tuple[List[int], List[int], List[int], List[int]]]
    # interaction phase (zero/empty when the AIR has no interaction columns)
    inter_root: int = 0
    inter_openings: List[Tuple[List[int], List[int], List[int], List[int]]] = None


def _row_leaves(columns_lde: List[List[int]]) -> List[int]:
    """Leaf per LDE row: fold the row's column values in a Pedersen chain."""
    n = len(columns_lde[0])
    acc = [0] * n
    for col in columns_lde:
        acc = pedersen_hash_ints(list(zip(acc, col)))
    return acc


class StarkProver:
    def __init__(self, air: Air, blowup: int = 8, n_queries: int = 16, sharding=None):
        """sharding: optional jax.sharding.NamedSharding whose spec shards
        the LDE-row axis (e.g. NamedSharding(mesh, P(None, "dp", None))).
        The composition program's inputs are committed to it, so XLA
        partitions the whole constraint-eval/quotient stage across the
        mesh (trace sharded by rows, SURVEY.md section 2.5)."""
        self.air = air
        self.blowup = blowup
        self.n_queries = n_queries
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
        """
        key = (n, big, n_pub, n_boundary, n_chal)
        if key in self._programs:
            return self._programs[key]

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
        return run

    def prove(self, trace_columns: Sequence[Sequence[int]]) -> StarkProof:
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

        channel = Channel()
        channel.absorb(trace_root)

        # 2b. Interaction phase: draw randomness, build + commit the second
        # trace (grand-product/permutation columns).
        challenges = [channel.challenge() for _ in range(air.n_interaction_challenges)]
        inter_lde_ints: List[List[int]] = []
        inter_levels = None
        inter_root = 0
        if air.n_interaction_columns:
            inter_cols = air.build_interaction(trace_columns, challenges)
            assert len(inter_cols) == air.n_interaction_columns
            icols = jnp.asarray(np.stack([f.pack(list(col)) for col in inter_cols]))
            inter_ldes_all = np.asarray(
                ntt.lde(ntt.ntt(icols, inverse=True), self.blowup, shift=FIELD_GEN)
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
        comp_ints = [int(v) for v in unpack_ints(np.asarray(comp_std))]

        # 6. FRI on the composition codeword, seeded by the running channel.
        fri_proof = fri_commit(
            comp_ints,
            offset=FIELD_GEN,
            final_size=max(4, self.air.transition_degree * 2),
            n_queries=self.n_queries,
            channel_seed=channel.state,
        )

        # 7. Open both trace trees at the FRI query points (and their
        # next-row counterparts) so the verifier can recompute the
        # composition.
        openings = []
        inter_openings = [] if air.n_interaction_columns else None
        for q in fri_proof.indices:
            q_next = (q + self.blowup) % big
            vals_q = [lde_ints[c][q] for c in range(air.n_columns)]
            vals_qn = [lde_ints[c][q_next] for c in range(air.n_columns)]
            openings.append(
                (
                    vals_q,
                    vals_qn,
                    auth_path_from_levels(trace_levels, q),
                    auth_path_from_levels(trace_levels, q_next),
                )
            )
            if air.n_interaction_columns:
                ivals_q = [
                    inter_lde_ints[c][q] for c in range(air.n_interaction_columns)
                ]
                ivals_qn = [
                    inter_lde_ints[c][q_next]
                    for c in range(air.n_interaction_columns)
                ]
                inter_openings.append(
                    (
                        ivals_q,
                        ivals_qn,
                        auth_path_from_levels(inter_levels, q),
                        auth_path_from_levels(inter_levels, q_next),
                    )
                )

        return StarkProof(
            trace_root=trace_root,
            trace_length=n,
            blowup=self.blowup,
            fri=fri_proof,
            trace_openings=openings,
            inter_root=inter_root,
            inter_openings=inter_openings,
        )


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


def verify_stark(air: Air, proof: StarkProof, claimed_boundary=None) -> bool:
    """Re-derive channel values, check trace openings, recompute the
    composition at every query, and verify the FRI proof."""
    n = proof.trace_length
    big = n * proof.blowup
    channel = Channel()
    channel.absorb(proof.trace_root)
    challenges = [channel.challenge() for _ in range(air.n_interaction_challenges)]
    if air.n_interaction_columns:
        if proof.inter_openings is None or len(proof.inter_openings) != len(
            proof.trace_openings
        ):
            return False
        channel.absorb(proof.inter_root)

    # Public columns: interpolate once (host coefficients), evaluate at each
    # query point by Horner — they are not part of the commitment.
    pub_cols = air.public_columns()
    if pub_cols:
        from stark_perpetual_tpu.ops.field import stark_prime_field

        f = stark_prime_field()
        ntt = ntt_ops()
        pub_coeffs = [
            [int(v) for v in unpack_ints(np.asarray(ntt.ntt(f.pack(list(col)), inverse=True)))]
            for col in pub_cols
        ]
    else:
        pub_coeffs = []

    # Re-derive alphas in prover order.
    n_total_cols = air.n_columns + air.n_interaction_columns
    n_transitions = len(
        air.transition_exprs_host_chal(
            [0] * n_total_cols, [0] * n_total_cols, [0] * len(pub_cols), [1] * len(challenges)
        )
    )
    t_alphas = [channel.challenge() for _ in range(n_transitions)]
    boundary = air.boundary() if claimed_boundary is None else claimed_boundary
    b_alphas = [channel.challenge() for _ in boundary]

    final_size = max(4, air.transition_degree * 2)
    degree_bound = n * air.transition_degree
    if not fri_verify(
        proof.fri,
        final_size=final_size,
        channel_seed=channel.state,
        degree_bound=degree_bound,
    ):
        return False

    # Re-derive the query indices exactly as fri_verify does.
    fri_channel = Channel(channel.state)
    for root in proof.fri.layer_roots:
        fri_channel.absorb(root)
        fri_channel.challenge()
    for c in proof.fri.final_coeffs:
        fri_channel.absorb(c)
    indices = fri_channel.query_indices(len(proof.fri.queries), big)

    w_big = root_of_unity(big)
    w_n = root_of_unity(n)
    g_last = pow(w_n, n - 1, FIELD_PRIME)
    divisors = air.transition_divisors()
    for qi, (q, (vals_q, vals_qn, path_q, path_qn), per_layer) in enumerate(
        zip(indices, proof.trace_openings, proof.fri.queries)
    ):
        q_next = (q + proof.blowup) % big
        leaf_q = _fold_row(vals_q)
        leaf_qn = _fold_row(vals_qn)
        if not verify_path(leaf_q, q, path_q, proof.trace_root):
            return False
        if not verify_path(leaf_qn, q_next, path_qn, proof.trace_root):
            return False
        if air.n_interaction_columns:
            ivals_q, ivals_qn, ipath_q, ipath_qn = proof.inter_openings[qi]
            if not verify_path(_fold_row(ivals_q), q, ipath_q, proof.inter_root):
                return False
            if not verify_path(
                _fold_row(ivals_qn), q_next, ipath_qn, proof.inter_root
            ):
                return False
            vals_q = list(vals_q) + list(ivals_q)
            vals_qn = list(vals_qn) + list(ivals_qn)

        x = FIELD_GEN * pow(w_big, q, FIELD_PRIME) % FIELD_PRIME
        inv_z_all = pow((pow(x, n, FIELD_PRIME) - 1) % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
        inv_z = (x - g_last) % FIELD_PRIME * inv_z_all % FIELD_PRIME
        pub_q = [_horner(coeffs, x) for coeffs in pub_coeffs]
        comp = 0
        for k, (alpha, cval) in enumerate(
            zip(t_alphas, air.transition_exprs_host_chal(vals_q, vals_qn, pub_q, challenges))
        ):
            div = inv_z if divisors is None or divisors[k] == "trans" else inv_z_all
            comp = (comp + alpha * cval % FIELD_PRIME * div) % FIELD_PRIME
        for alpha, (col, row, value) in zip(b_alphas, boundary):
            x_row = pow(w_n, row, FIELD_PRIME)
            inv = pow((x - x_row) % FIELD_PRIME, FIELD_PRIME - 2, FIELD_PRIME)
            comp = (comp + alpha * ((vals_q[col] - value) % FIELD_PRIME) % FIELD_PRIME * inv) % FIELD_PRIME

        # The FRI layer-0 opening at q must equal the recomputed composition.
        half = big // 2
        fx, fmx = per_layer[0][0], per_layer[0][1]
        observed = fx if q < half else fmx
        if observed != comp:
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
