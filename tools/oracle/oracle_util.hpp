// Shared helpers for the golden-vector scheme-flow oracles.
//
// Each dump replicates one reference example's algorithm + RNG draw order
// directly on the reference's vendored MIRACL-core build (never copied into
// this repo), mirroring the wrapper semantics:
//   select_in<*Zp>  = BIG_randomnum(r-1)+1     (zp_number.hpp:208-215)
//   select_in<Zp>   = BIG_randomnum(r)         (zp_number.hpp:201-206)
//   select_in<*G1>  = generator^select_in<*Zp> (g1_point.hpp:416-426)
//   select_in<*G2>  = generator2^select_in<*Zp> (g2_point.hpp:113-127)
//   encode_to<Zp>   = 31-byte units, byte[16]=1 (zp_number.hpp:873-899)
//   serialize       = 48B BE Zp / 49B G1 / 97B G2 compressed / 576B GT
#pragma once
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "miracl-core/pair_BLS12381.h"
#include "miracl-core/randapi.h"

using namespace core;
using namespace B384_58;
using namespace BLS12381;

static std::string hex(const char* d, int n) {
    static const char* t = "0123456789abcdef";
    std::string o;
    for (int i = 0; i < n; i++) {
        unsigned char c = (unsigned char)d[i];
        o += t[c >> 4];
        o += t[c & 15];
    }
    return o;
}

// select_in<*Zp>: randomnum(r-1) + 1
static void rand_nonzero(BIG out, csprng* rng) {
    BIG r1;
    BIG_rcopy(r1, CURVE_Order);
    BIG_dec(r1, 1);
    BIG_norm(r1);
    BIG_randomnum(out, r1, rng);
    BIG_inc(out, 1);
    BIG_norm(out);
}

// select_in<Zp>: randomnum(r)
static void rand_zp(BIG out, csprng* rng) {
    BIG r;
    BIG_rcopy(r, CURVE_Order);
    BIG_randomnum(out, r, rng);
}

// select_in<*G1>: generator ^ select_in<*Zp>; returns the point
static void rand_g1(ECP* out, csprng* rng) {
    BIG x;
    rand_nonzero(x, rng);
    ECP_generator(out);
    PAIR_G1mul(out, x);
}

static void rand_g2(ECP2* out, csprng* rng) {
    BIG x;
    rand_nonzero(x, rng);
    ECP2_generator(out);
    PAIR_G2mul(out, x);
}

static std::string ser_zp(BIG v) {
    char b[48];
    BIG_toBytes(b, v);
    return hex(b, 48);
}

static std::string ser_g1(ECP* p) {
    char buf[100];
    octet W{0, sizeof(buf), buf};
    ECP_toOctet(&W, p, true);
    return hex(W.val, W.len);
}

static std::string ser_g2(ECP2* p) {
    char buf[200];
    octet W{0, sizeof(buf), buf};
    ECP2_toOctet(&W, p, true);
    return hex(W.val, W.len);
}

static std::string ser_gt(FP12* f) {
    char buf[600];
    octet W{0, sizeof(buf), buf};
    FP12_toOctet(&W, f);
    return hex(W.val, W.len);
}

// BIG is a raw array type (long[7]); wrap for containers
struct Big {
    BIG v;
    Big() { BIG_zero(v); }
    Big(const Big& o) { BIG_copy(v, const_cast<Big&>(o).v); }
    Big& operator=(const Big& o) {
        BIG_copy(v, const_cast<Big&>(o).v);
        return *this;
    }
};

// encode_to<Zp>: 31-byte units inside a 48-byte BE buffer with byte[16] = 1
static std::vector<std::string> encode_to_zp_hex(const char* msg, size_t len,
                                                 std::vector<Big>* nums = nullptr) {
    std::vector<std::string> out;
    size_t full = len / 31, rest = len % 31;
    auto emit = [&](const char* unit, size_t n) {
        char buf[48];
        memset(buf, 0, 48);
        buf[16] = 1;
        memcpy(buf + 17, unit, n);
        out.push_back(hex(buf, 48));
        if (nums) {
            Big b;
            BIG_fromBytes(b.v, buf);
            nums->push_back(b);
        }
    };
    for (size_t i = 0; i < full; i++) emit(msg + 31 * i, 31);
    if (rest) emit(msg + len - rest, rest);
    return out;
}

// Zp helpers mod r
static void zp_add(BIG out, BIG a, BIG b) {
    BIG r;
    BIG_rcopy(r, CURVE_Order);
    BIG_copy(out, a);
    BIG_add(out, out, b);
    BIG_mod(out, r);
    BIG_norm(out);
}

static void zp_mul(BIG out, BIG a, BIG b) {
    BIG r;
    BIG_rcopy(r, CURVE_Order);
    BIG_modmul(out, a, b, r);
}

static void zp_neg(BIG out, BIG a) {
    BIG r;
    BIG_rcopy(r, CURVE_Order);
    BIG_modneg(out, a, r);
    BIG_norm(out);
}

static void zp_inv(BIG out, BIG a) {
    BIG r;
    BIG_rcopy(r, CURVE_Order);
    BIG_invmodp(out, a, r);
}

static void zp_sub(BIG out, BIG a, BIG b) {
    BIG nb;
    zp_neg(nb, b);
    zp_add(out, a, nb);
}

// reduced pairing e(P in G1, Q in G2)
static void ate(FP12* out, ECP* p, ECP2* q) {
    PAIR_ate(out, q, p);
    PAIR_fexp(out);
}
