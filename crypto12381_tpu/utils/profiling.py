"""First-class timing / profiling utilities (SURVEY §5).

The reference's only instrumentation is a RAII microsecond timer in two
example tests (examples/MHAC-bbs/test.cpp:9-32, examples/AC-rps/test.cpp:9-32).
Here `timed` is the library-level equivalent, plus a jax.profiler trace
context for on-device kernel inspection and a roofline helper used by
tools/gen_baseline.py to regenerate BASELINE.md's speed-of-light table.
"""

from __future__ import annotations

import contextlib
import sys
import time


class timed:
    """Context manager / decorator printing wall-clock μs, reference-style.

        with timed("keygen"):
            keys = keygen(...)

    Device work is synchronized at exit when `sync` pytrees are returned by
    the body via `.result = ...` or passed at construction.
    """

    def __init__(self, label: str = "", stream=None):
        self.label = label
        self.stream = stream if stream is not None else sys.stderr
        self.elapsed_us: float | None = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed_us = (time.perf_counter() - self.t0) * 1e6
        prefix = f"{self.label}: " if self.label else ""
        print(f"{prefix}finish in {self.elapsed_us:.0f} μs",
              file=self.stream, flush=True)
        return False

    def __call__(self, fn):
        def wrapped(*a, **kw):
            with timed(self.label or fn.__name__, self.stream):
                out = fn(*a, **kw)
                try:
                    import jax

                    jax.block_until_ready(out)
                except Exception:
                    pass
                return out

        return wrapped


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/jax_trace"):
    """jax.profiler trace context — inspect per-kernel timings with
    tensorboard or xprof on the dumped trace."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def roofline(name: str, elems: int, seconds: float, vpu_ops_per_elem: float,
             mxu_flops_per_elem: float = 0.0,
             vpu_peak: float = 3.9e12, mxu_peak: float = 197e12) -> dict:
    """Per-kernel roofline record: measured rate, implied device op rates,
    and the fraction of the binding unit's peak (v5e defaults: ~3.9 T f32
    VPU op/s, ~197 TFLOP/s bf16 MXU)."""
    rate = elems / seconds
    vpu = rate * vpu_ops_per_elem
    mxu = rate * mxu_flops_per_elem
    return {
        "kernel": name,
        "rate_per_s": rate,
        "vpu_ops_per_s": vpu,
        "mxu_flops_per_s": mxu,
        "vpu_frac_of_peak": vpu / vpu_peak,
        "mxu_frac_of_peak": mxu / mxu_peak if mxu_flops_per_elem else 0.0,
    }
