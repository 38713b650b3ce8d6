"""Model layer: the STARK proving framework and the two program families.

- ``air``: generic AIR -> STARK prover/verifier (trace commit, composition,
  FRI) with public preprocessed columns.
- ``pedersen_air`` / ``ecdsa_air``: the hash and signature builtins'
  arithmetizations (ec-subset-sum with hash pooling; mimic ladders).
- ``perpetual`` / ``dex``: the two Cairo program families as semantic
  engines with device-batched crypto.
"""

from stark_perpetual_tpu.models.air import Air, StarkProof, StarkProver, verify_stark
from stark_perpetual_tpu.models.ecdsa_air import EcdsaVerifyStark, EcMultAir, MultBlock
from stark_perpetual_tpu.models.pedersen_air import PedersenBuiltinAir

__all__ = [
    "Air",
    "StarkProof",
    "StarkProver",
    "verify_stark",
    "PedersenBuiltinAir",
    "EcMultAir",
    "MultBlock",
    "EcdsaVerifyStark",
]
