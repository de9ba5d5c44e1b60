// CPU baseline for BASELINE.md: reference (MIRACL-core) pairing and G1-mul
// throughput, single core — the reference library is single-threaded
// (SURVEY §2.4), so this is its whole-machine rate.
#include <chrono>
#include <cstdio>

#include "miracl-core/pair_BLS12381.h"
#include "miracl-core/randapi.h"

using namespace core;
using namespace B384_58;
using namespace BLS12381;

int main() {
    csprng rng;
    char seedstr[] = "bench";
    octet so{5, 5, seedstr};
    CREATE_CSPRNG(&rng, &so);

    BIG r, x, y;
    BIG_rcopy(r, CURVE_Order);
    BIG_randomnum(x, r, &rng);
    BIG_randomnum(y, r, &rng);

    ECP g;
    ECP2 h;
    ECP_generator(&g);
    ECP2_generator(&h);
    PAIR_G1mul(&g, x);
    PAIR_G2mul(&h, y);

    const int N = 200;
    FP12 f;
    auto t0 = std::chrono::high_resolution_clock::now();
    for (int i = 0; i < N; i++) {
        PAIR_ate(&f, &h, &g);
        PAIR_fexp(&f);
    }
    auto t1 = std::chrono::high_resolution_clock::now();
    double us =
        std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count();
    printf("{\"pairing_us\": %.2f, \"pairings_per_s\": %.1f", us / N,
           1e6 * N / us);

    const int M = 2000;
    t0 = std::chrono::high_resolution_clock::now();
    for (int i = 0; i < M; i++) {
        PAIR_G1mul(&g, x);
    }
    t1 = std::chrono::high_resolution_clock::now();
    us = std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count();
    printf(", \"g1mul_us\": %.2f, \"g1mul_per_s\": %.1f}\n", us / M,
           1e6 * M / us);
    return 0;
}
