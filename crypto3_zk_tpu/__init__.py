"""crypto3_zk_tpu — a TPU-native zero-knowledge proving framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
NilFoundation/crypto3-zk (see SURVEY.md for the blueprint). Layer map:

- ``fields``          field/curve parameters + host scalar oracle (L0 host)
- ``ops``             vectorized limb arithmetic, NTT, MSM, hashes (L0 TPU)
- ``poly``            polynomial module: coefficient + DFS forms (L0)
- ``transcript``      Fiat-Shamir transcripts (L1)
- ``arithmetization`` PLONK tables / R1CS / QAP + reductions (L3)
- ``commitments``     FRI, LPC, KZG, ... (L2)
- ``models``          proof systems: Placeholder, Groth16, ... (L4)
- ``parallel``        mesh/sharding: distributed NTT, MSM, prover (SPMD)
- ``utils``           profiling, serialization, config
"""

__version__ = "0.1.0"
