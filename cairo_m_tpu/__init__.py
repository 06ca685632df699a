"""cairo_m_tpu — a TPU-native Cairo-M zkVM stack (JAX/XLA/Pallas).

Re-implements the full capability surface of kkrt-labs/cairo-m (Rust
reference, see /root/repo/SURVEY.md) as an idiomatic JAX framework:

- ``field``     M31 / CM31 / QM31 arithmetic (host NumPy + device uint32)
- ``hash``      Poseidon2-M31 (T=16) and Blake2s (channel + device Merkle)
- ``isa``       instruction set, Program/ABI metadata, execution state
- ``vm``        the two-register VM with QM31 memory + continuation segments
- ``compiler``  the Cairo-M language: parser -> semantic -> MIR -> CASM
- ``prover``    adapter, AIR components, circle-STARK core, prove/verify
- ``parallel``  mesh / sharding helpers for multi-chip scaling
"""

__version__ = "0.1.0"
