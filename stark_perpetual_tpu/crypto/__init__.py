from stark_perpetual_tpu.crypto.signature import (  # noqa: F401
    InvalidPublicKeyError,
    get_random_private_key,
    get_y_coordinate,
    grind_key,
    is_valid_stark_key,
    is_valid_stark_private_key,
    pedersen_hash,
    pedersen_hash_as_point,
    private_to_stark_key,
    sign,
    verify,
)
