"""Staged arithmetization: STARK proofs for a perpetual batch's builtins.

In the reference, a perpetual batch becomes one Cairo execution whose AIR
is dominated by the builtins it invokes: the pedersen builtin for every
message/leaf hash and the ecdsa builtin for every signature
(src/services/perpetual/cairo/main.cairo:1 declares
``%builtins output pedersen range_check ecdsa``). This module proves
exactly those obligations for a batch run:

- every 2-ary Pedersen invocation consumed while hashing the batch's
  messages, pooled into one ``PedersenBuiltinAir`` trace;
- every signature verification, as mimic-ladder blocks in one
  ``EcdsaVerifyStark`` proof.

``prove_batch_commitments`` extends the pool to the *full* run: the
batch's state-tree updates (Merkle node hashes, position leaf hashes —
the work of merkle_multi_update at state/state.cairo:155-173) are
recorded through the global ``pedersen_call_log`` funnel and proven in
the same pooled pedersen trace. The register-level trace of the
remaining business logic (dict squash, arithmetic) is the documented
round-2 gap in PARITY.md.
"""

from typing import Tuple

from stark_perpetual_tpu.models.builtin_prover import (
    BatchBuiltinProofs,
    RecordingHash,
    prove_builtin_obligations,
    resolve_public_key_point,
    verify_batch_builtins,
)
from stark_perpetual_tpu.models.perpetual.engine import CryptoPrepass
from stark_perpetual_tpu.ops.pedersen import pedersen_call_log

__all__ = [
    "BatchBuiltinProofs",
    "prove_batch_builtins",
    "prove_batch_commitments",
    "verify_batch_builtins",
]


def prove_batch_builtins(
    program_input, blowup: int = 8, n_queries: int = 16
) -> BatchBuiltinProofs:
    """Run the batch's crypto prepass under a recording hash and prove the
    resulting builtin logs."""
    rec = RecordingHash()
    prepass = CryptoPrepass(hash_function=rec)
    prepass.prepare(program_input)

    items = []
    for (msg, r, s, pub), ok in zip(prepass.sig_items, prepass.sig_results):
        if not ok:
            continue  # invalid signatures take the error-code path, not the AIR
        point = resolve_public_key_point(msg, r, s, pub)
        assert point is not None, "prepass accepted a signature the mimic rejects"
        items.append((msg, r, s, point))

    return prove_builtin_obligations(rec.calls, items, blowup=blowup, n_queries=n_queries)


def _resolve_sig_items(prepass: CryptoPrepass):
    items = []
    for (msg, r, s, pub), ok in zip(prepass.sig_items, prepass.sig_results):
        if not ok:
            continue  # invalid signatures take the error-code path, not the AIR
        point = resolve_public_key_point(msg, r, s, pub)
        assert point is not None, "prepass accepted a signature the mimic rejects"
        items.append((msg, r, s, point))
    return items


def prove_batch_commitments(
    program_input,
    blowup: int = 8,
    n_queries: int = 16,
    prove: bool = True,
) -> Tuple["BatchBuiltinProofs", "object"]:
    """Run the FULL batch program and prove every hash it consumed.

    Unlike ``prove_batch_builtins`` (message hashes + signatures only),
    this records the complete pedersen-builtin obligation set of
    ``output.run_program`` — message chains, position-leaf hashes and
    every Merkle/Patricia node hashed while updating the state trees —
    via the global ``pedersen_call_log`` funnel, and pools all of it
    into one ``PedersenBuiltinAir`` proof alongside the ecdsa proof.

    Trace budget: a batch consuming H hashes yields a 512*next_pow2(H)-row
    pedersen trace; production-height trees (32/64 levels) belong on the
    TPU prover path. ``prove=False`` collects and sanity-checks the
    obligation pool without building the STARK (used by tests and for
    sizing).

    Returns (proofs, run_result).
    """
    from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash
    from stark_perpetual_tpu.models.perpetual import output as output_mod

    rec = RecordingHash()
    prepass = CryptoPrepass(hash_function=rec)
    prepass.prepare(program_input)
    with pedersen_call_log() as tree_calls:
        result = output_mod.run_program(program_input, crypto=prepass)
    items = _resolve_sig_items(prepass)

    calls = rec.calls + tree_calls
    if not prove:
        for a, b, h in calls:
            assert fast_pedersen_hash(a, b) == h
        return (
            BatchBuiltinProofs(
                pedersen_pairs=[(a, b) for a, b, _ in calls],
                pedersen_outputs=[h for _, _, h in calls],
                pedersen_proof=None,
                ecdsa_items=items,
                ecdsa_proof=None,
            ),
            result,
        )
    proofs = prove_builtin_obligations(calls, items, blowup=blowup, n_queries=n_queries)
    return proofs, result
