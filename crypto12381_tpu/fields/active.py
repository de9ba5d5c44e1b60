"""Active Fp engine selector.

Two interchangeable engines implement the same ctx-first function API over
opaque limb arrays (tower/curves/pairing/hashing never look inside):

  * ``fp32`` (default) — signed 8-bit limbs in float32; general products as
    fp32 FMAs, Montgomery REDC as bf16 MXU matmuls; fused Pallas kernel on
    TPU.  The performance engine.
  * ``fp`` (``CRYPTO12381_FP_ENGINE=int16``) — 16-bit limbs in int32 with
    the K-constant loose-subtraction discipline.  The round-1 engine, kept
    as a differential-testing oracle and fallback.

Both use the same Montgomery R (2^400 for Fp), so representations convert
by pure re-limbing (fp32.from_limbs16 / to_limbs16).
"""

from __future__ import annotations

import os

from . import fp as _fp
from . import fp32 as _fp32

ENGINE = os.environ.get("CRYPTO12381_FP_ENGINE", "fp32")
_impl = _fp if ENGINE == "int16" else _fp32


def __getattr__(name):
    return getattr(_impl, name)


def __dir__():
    return dir(_impl)
