"""Prover configuration (reference prover_config.rs)."""

from __future__ import annotations

from .stark.fri import FriConfig
from .stark.pcs import PcsConfig

# 96-bit conjectured security: n_queries*log_blowup + pow_bits = 96
REGULAR_96_BITS = PcsConfig(
    pow_bits=16,
    fri_config=FriConfig(
        log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=80
    ),
)


def test_config(n_queries=12, pow_bits=4) -> PcsConfig:
    """Small config for fast tests (NOT production security)."""
    return PcsConfig(
        pow_bits=pow_bits,
        fri_config=FriConfig(
            log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=n_queries
        ),
    )
