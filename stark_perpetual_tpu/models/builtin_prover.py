"""Shared builtin-proving core: pedersen + ecdsa obligations -> STARKs.

Both Cairo programs (perpetual main.cairo:1, dex main.cairo) declare
``%builtins output pedersen range_check ecdsa``; at proof time the heavy
rows of their AIRs are those builtins. This module pools an arbitrary log
of 2-ary Pedersen calls into one ``PedersenBuiltinAir`` proof and a list
of signature checks into one ``EcdsaVerifyStark`` proof; the program
families layer their own obligation collection on top
(models/perpetual/prove.py, models/dex/prove.py).
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

from stark_perpetual_tpu.crypto.signature import fast_pedersen_hash, get_y_coordinate
from stark_perpetual_tpu.models.air import StarkProof, StarkProver, verify_stark
from stark_perpetual_tpu.models.ecdsa_air import EcdsaStarkProof, EcdsaVerifyStark
from stark_perpetual_tpu.models.pedersen_air import PedersenBuiltinAir
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


def resolve_public_key_point(msg: int, r: int, s: int, pub_x: int) -> Optional[Tuple[int, int]]:
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


def prove_builtin_obligations(
    pedersen_calls: List[Tuple[int, int, int]],
    sig_items: List[Tuple[int, int, int, Tuple[int, int]]],
    blowup: int = 8,
    n_queries: int = 16,
) -> BatchBuiltinProofs:
    """Prove a pedersen-call log and a resolved signature list.

    Raises ValueError if a hash input lands in the [2^251, p) completeness
    sliver (see pedersen_air docstring).
    """
    pairs = [(a, b) for a, b, _h in pedersen_calls]
    outputs = [h for _a, _b, h in pedersen_calls]
    pedersen_proof = None
    if pairs:
        while len(pairs) & (len(pairs) - 1):
            pairs.append((0, 0))
            outputs.append(fast_pedersen_hash(0, 0))
        air = PedersenBuiltinAir(pairs, outputs)
        pedersen_proof = StarkProver(air, blowup=blowup, n_queries=n_queries).prove(air.trace())

    ecdsa_proof = None
    if sig_items:
        # Compiling the ECDSA prover's graphs with the pedersen prover's
        # tracing caches still live makes XLA:CPU attempt a pathological
        # (>100 GB) allocation in this jaxlib; dropping the caches between
        # the two provers avoids it (and costs only a recompile).
        import jax

        jax.clear_caches()
        ecdsa_proof = EcdsaVerifyStark(blowup=blowup, n_queries=n_queries).prove(sig_items)

    return BatchBuiltinProofs(
        pedersen_pairs=pairs,
        pedersen_outputs=outputs,
        pedersen_proof=pedersen_proof,
        ecdsa_items=sig_items,
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


def drop_cpu_executables():
    """Between heavyweight proves on the CPU backend, drop live executables.

    XLA:CPU can abort compiles in long sessions when too many large
    programs stay resident (see tests/conftest.py). On an accelerator
    backend this would throw away remotely compiled programs — the most
    expensive asset a proving process owns — so it is a no-op there.
    """
    import jax

    if jax.default_backend() == "cpu":
        jax.clear_caches()
