"""Bit-exact reimplementation of the reference's deterministic CSPRNG.

The reference seeds MIRACL's csprng (rand.cpp:35-151, randapi.cpp:27-35) from
a seed string and every example's outputs depend on this exact byte stream
(SURVEY §3.3).  This is an independent implementation of the same published
algorithm (Marsaglia-Zaman subtract-with-borrow lagged Fibonacci, SHA-256
pool): seed -> SHA256 -> 8x sirand stir (10,000-step warm-up each) -> pool =
SHA256(low bytes of 128 generator words); bytes are served from the pool,
which is re-hashed every 32 bytes.

Also implements BIG_randomnum (big_B384_58.cpp:1575-1598): draw 2*nbits(q)
bits LSB-first from successive bytes, assemble MSB-first, reduce mod q.

A C++ twin lives in cpp/compat (same algorithm, used for bulk host-side
stream generation); this Python version is the portable fallback and the
specification for tests.
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess

_NK = 21
_NJ = 6
_NV = 8
_M32 = 0xFFFFFFFF


def _load_native():
    """Optional native backend (cpp/compat_csprng.c) for bulk streams."""
    root = pathlib.Path(__file__).parents[2] / "cpp"
    so = root / "libcrypto12381_compat.so"
    if not so.exists():
        try:
            subprocess.run(
                ["make", "-C", str(root)], capture_output=True, check=True
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.crypto12381_csprng_size.restype = ctypes.c_int
        lib.crypto12381_csprng_seed.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.crypto12381_csprng_bytes.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long]
        return lib
    except OSError:
        return None


_NATIVE = _load_native()


class RandomEngine:
    """Drop-in equivalent of the reference's RandomEngine
    (include/crypto12381/random.hpp:8-28, src/random.cpp:9-31)."""

    def __init__(self, seed: bytes | str):
        if isinstance(seed, str):
            seed = seed.encode()
        self._ira = [0] * _NK
        self._rndptr = 0
        self._borrow = 0
        self._pool = b""
        self._pool_ptr = 0
        self._seed(seed)

    # -- Marsaglia-Zaman generator ------------------------------------

    def _sbrand(self) -> int:
        self._rndptr += 1
        if self._rndptr < _NK:
            return self._ira[self._rndptr]
        self._rndptr = 0
        k = _NK - _NJ
        for i in range(_NK):
            if k == _NK:
                k = 0
            t = self._ira[k]
            pdiff = (t - self._ira[i] - self._borrow) & _M32
            if pdiff < t:
                self._borrow = 0
            if pdiff > t:
                self._borrow = 1
            self._ira[i] = pdiff
            k += 1
        return self._ira[0]

    def _sirand(self, seed: int) -> None:
        self._borrow = 0
        self._rndptr = 0
        self._ira[0] ^= seed
        m = 1
        for i in range(1, _NK):
            in_ = (_NV * i) % _NK
            self._ira[in_] ^= m
            t = m
            m = (seed - m) & _M32
            seed = t
        for _ in range(10000):
            self._sbrand()

    def _fill_pool(self) -> None:
        h = hashlib.sha256()
        for _ in range(128):
            h.update(bytes([self._sbrand() & 0xFF]))
        self._pool = h.digest()
        self._pool_ptr = 0

    def _seed(self, raw: bytes) -> None:
        self._pool_ptr = 0
        self._ira = [0] * _NK
        if raw:
            digest = hashlib.sha256(raw).digest()
            for i in range(8):
                word = int.from_bytes(digest[4 * i : 4 * i + 4], "little")
                self._sirand(word)
        self._fill_pool()

    # -- public API ----------------------------------------------------

    def rand_byte(self) -> int:
        r = self._pool[self._pool_ptr]
        self._pool_ptr += 1
        if self._pool_ptr >= 32:
            self._fill_pool()
        return r

    def rand_bytes(self, n: int) -> bytes:
        """Bulk byte stream (used by batched protocol runs)."""
        return bytes(self.rand_byte() for _ in range(n))

    def random_mod(self, q: int) -> int:
        """BIG_randomnum: 2*nbits(q) bits, first-drawn bit most significant,
        reduced mod q."""
        n = 2 * q.bit_length()
        d = 0
        r = 0
        j = 0
        for _ in range(n):
            if j == 0:
                r = self.rand_byte()
            else:
                r >>= 1
            d = (d << 1) + (r & 1)
            j = (j + 1) & 7
        return d % q

    def random_mod_nonzero(self, q: int) -> int:
        """select_except0 semantics (zp_number.hpp:208-215): draw mod (q-1),
        then add 1."""
        return self.random_mod(q - 1) + 1


class NativeRandomEngine:
    """ctypes wrapper over the C twin (cpp/compat_csprng.c) — identical
    stream, used for bulk generation.  Falls back to RandomEngine when the
    shared library is unavailable."""

    def __init__(self, seed: bytes | str):
        if isinstance(seed, str):
            seed = seed.encode()
        self._state = ctypes.create_string_buffer(
            _NATIVE.crypto12381_csprng_size()
        )
        _NATIVE.crypto12381_csprng_seed(self._state, seed, len(seed))

    def rand_bytes(self, n: int) -> bytes:
        out = ctypes.create_string_buffer(n)
        _NATIVE.crypto12381_csprng_bytes(self._state, out, n)
        return out.raw

    def rand_byte(self) -> int:
        return self.rand_bytes(1)[0]

    def random_mod(self, q: int) -> int:
        n = 2 * q.bit_length()
        nbytes = (n + 7) // 8
        raw = self.rand_bytes(nbytes)
        d = 0
        bit_i = 0
        for _ in range(n):
            b = (raw[bit_i // 8] >> (bit_i % 8)) & 1
            d = (d << 1) + b
            bit_i += 1
        return d % q

    def random_mod_nonzero(self, q: int) -> int:
        return self.random_mod(q - 1) + 1


def create_random_engine(seed: bytes | str, native: bool = False):
    if native and _NATIVE is not None:
        return NativeRandomEngine(seed)
    return RandomEngine(seed)
