"""Staged arithmetization: STARK proofs for a batch's crypto builtins.

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

The register-level trace of the surrounding business logic (dict squash,
arithmetic) is the remaining arithmetization gap, documented in PARITY.md.
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash, get_y_coordinate
from stark_perpetual_tpu.models.air import StarkProof, StarkProver, verify_stark
from stark_perpetual_tpu.models.ecdsa_air import EcdsaStarkProof, EcdsaVerifyStark
from stark_perpetual_tpu.models.pedersen_air import PedersenBuiltinAir
from stark_perpetual_tpu.models.perpetual.engine import CryptoPrepass
from stark_perpetual_tpu.params import FIELD_PRIME


class RecordingHash:
    """Hash function that logs every 2-ary Pedersen call (the builtin log)."""

    def __init__(self):
        self.calls: List[Tuple[int, int, int]] = []  # (a, b, h)

    def __call__(self, a: int, b: int) -> int:
        h = fast_pedersen_hash(a, b)
        self.calls.append((a, b, h))
        return h


@dataclass
class BatchBuiltinProofs:
    # Pedersen builtin: pooled (a, b) -> h claims + proof.
    pedersen_pairs: List[Tuple[int, int]]
    pedersen_outputs: List[int]
    pedersen_proof: Optional[StarkProof]
    # ECDSA builtin: (msg, r, s, (pub_x, pub_y)) claims + proof.
    ecdsa_items: List[Tuple[int, int, int, Tuple[int, int]]]
    ecdsa_proof: Optional[EcdsaStarkProof]


def _resolve_public_key_point(msg: int, r: int, s: int, pub_x: int) -> Optional[Tuple[int, int]]:
    """Find the y-parity under which the AIR-faithful chain accepts."""
    from stark_perpetual_tpu.crypto.signature import verify

    try:
        y = get_y_coordinate(pub_x)
    except Exception:
        return None
    for cand in ((pub_x, y), (pub_x, (-y) % FIELD_PRIME)):
        try:
            if verify(msg, r, s, cand):
                return cand
        except AssertionError:
            continue
    return None


def prove_batch_builtins(
    program_input, blowup: int = 8, n_queries: int = 16
) -> BatchBuiltinProofs:
    """Run the batch's crypto prepass under a recording hash and prove the
    resulting builtin logs. Raises ValueError if a hash input lands in the
    [2^251, p) completeness sliver (see pedersen_air docstring)."""
    rec = RecordingHash()
    prepass = CryptoPrepass(hash_function=rec)
    prepass.prepare(program_input)

    pairs = [(a, b) for a, b, _h in rec.calls]
    outputs = [h for _a, _b, h in rec.calls]
    pedersen_proof = None
    if pairs:
        while len(pairs) & (len(pairs) - 1):
            pairs.append((0, 0))
            outputs.append(fast_pedersen_hash(0, 0))
        air = PedersenBuiltinAir(pairs, outputs)
        pedersen_proof = StarkProver(air, blowup=blowup, n_queries=n_queries).prove(air.trace())

    items = []
    for (msg, r, s, pub), ok in zip(prepass.sig_items, prepass.sig_results):
        if not ok:
            continue  # invalid signatures take the error-code path, not the AIR
        point = _resolve_public_key_point(msg, r, s, pub)
        assert point is not None, "prepass accepted a signature the mimic rejects"
        items.append((msg, r, s, point))
    ecdsa_proof = None
    if items:
        # Compiling the ECDSA prover's graphs with the pedersen prover's
        # tracing caches still live makes XLA:CPU attempt a pathological
        # (>100 GB) allocation in this jaxlib; dropping the caches between
        # the two provers avoids it (and costs only a recompile).
        import jax

        jax.clear_caches()
        ecdsa_proof = EcdsaVerifyStark(blowup=blowup, n_queries=n_queries).prove(items)

    return BatchBuiltinProofs(
        pedersen_pairs=pairs,
        pedersen_outputs=outputs,
        pedersen_proof=pedersen_proof,
        ecdsa_items=items,
        ecdsa_proof=ecdsa_proof,
    )


def verify_batch_builtins(proofs: BatchBuiltinProofs) -> bool:
    if proofs.pedersen_proof is not None:
        air = PedersenBuiltinAir(proofs.pedersen_pairs, proofs.pedersen_outputs)
        if not verify_stark(air, proofs.pedersen_proof):
            return False
    if proofs.ecdsa_proof is not None:
        if not EcdsaVerifyStark().verify(proofs.ecdsa_items, proofs.ecdsa_proof):
            return False
    return True
