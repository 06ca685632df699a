from . import blake2s, poseidon2, poseidon2_params  # noqa: F401
