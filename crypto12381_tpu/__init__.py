"""crypto12381_tpu — a TPU-native BLS12-381 pairing framework.

Brand-new implementation with the capability surface of Adttil/crypto12381
(see SURVEY.md): batched field/curve/pairing arithmetic compiled for TPU via
JAX/XLA, multi-chip scaling through jax.sharding meshes, a bit-exact host
compatibility layer (CSPRNG, SHA3 framing, byte codecs), the paper-notation
protocol API, the symbolic algebra DSL, and nine example cryptosystems.

Layering (bottom up, mirroring SURVEY §1):
  fields/    batched Montgomery limb arithmetic (Fp, Fr) + Fp2/6/12 tower
  curves/    complete branchless G1/G2 group law, scalar multiplication
  pairing/   Miller loop + final exponentiation (reference-normalized)
  msm/       Pippenger multi-scalar multiplication
  hashing/   hash-to-Zp / SSWU hash-to-G1
  parallel/  mesh sharding: collectives over ICI for MSM/pairing batches
  compat/    bit-exact host primitives: CSPRNG, codecs
  api/       sets, elements, serialize/parse/hash, Σ/Π, symbolic DSL
  schemes/   PS, BBS, BBS+, BBS04, SSS, AC-{bbs,rbbs,rps}, MHAC-BBS
  pyref/     exact host oracle used for differential testing
"""

from .api.elements import (G1Element, G1Pow, G2Element, GTElement, GTPair,
                           ZpNumber, inverse, pair)
from .api.sets import (G1, G2, GT, Zp, create_random_engine, encode_to,
                       hash_, make_Zp, parse, polynomial, product_,
                       select_in, serialize, sum_)

__all__ = [
    "G1", "G2", "GT", "Zp",
    "G1Element", "G1Pow", "G2Element", "GTElement", "GTPair", "ZpNumber",
    "create_random_engine", "encode_to", "hash_", "inverse", "make_Zp",
    "pair", "parse", "polynomial", "product_", "select_in", "serialize",
    "sum_",
]

__version__ = "0.1.0"
