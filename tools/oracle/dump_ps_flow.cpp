// Oracle for the PS single-message flow (examples/ps/test.cpp:19-41):
// replicates the wrapper's algorithm + RNG draw order directly on
// MIRACL-core and dumps every serialized artifact, so the Python scheme can
// be compared byte-for-byte end to end.
#include <cstdio>
#include <string>

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

static void rand_nonzero(BIG out, csprng* rng) {
    // select_in<*Zp>: randomnum(r-1) + 1  (zp_number.hpp:208-215)
    BIG r1;
    BIG_rcopy(r1, CURVE_Order);
    BIG_dec(r1, 1);
    BIG_norm(r1);
    BIG_randomnum(out, r1, rng);
    BIG_inc(out, 1);
    BIG_norm(out);
}

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    char buf[1024];
    octet W{0, sizeof(buf), buf};

    // ---- key_gen ----
    BIG xg2, x, y;
    rand_nonzero(xg2, &rng);
    ECP2 g2;
    ECP2_generator(&g2);
    PAIR_G2mul(&g2, xg2);
    rand_nonzero(x, &rng);
    rand_nonzero(y, &rng);

    ECP2 X2, Y2;
    ECP2_copy(&X2, &g2);
    PAIR_G2mul(&X2, x);
    ECP2_copy(&Y2, &g2);
    PAIR_G2mul(&Y2, y);

    printf("{\n");
    W.len = 0; ECP2_toOctet(&W, &g2, true);
    printf("\"g2\": \"%s\",\n", hex(W.val, W.len).c_str());
    char skbuf[96];
    BIG_toBytes(skbuf, x);
    BIG_toBytes(skbuf + 48, y);
    printf("\"sk\": \"%s\",\n", hex(skbuf, 96).c_str());
    W.len = 0; ECP2_toOctet(&W, &X2, true);
    printf("\"X2\": \"%s\",\n", hex(W.val, W.len).c_str());
    W.len = 0; ECP2_toOctet(&W, &Y2, true);
    printf("\"Y2\": \"%s\",\n", hex(W.val, W.len).c_str());

    // ---- sign(message = 47 zero bytes + 23) ----
    char msg[48] = {0};
    msg[47] = 23;
    sha3 sh;
    SHA3_init(&sh, SHA3_HASH512);
    for (int i = 0; i < 48; i++) SHA3_process(&sh, msg[i]);
    char dig[64];
    SHA3_hash(&sh, dig);
    DBIG dm;
    BIG_dfromBytesLen(dm, dig, 64);
    BIG m, r;
    BIG_rcopy(r, CURVE_Order);
    BIG_ctdmod(m, dm, r, 64 * 8 - 255);

    BIG hx;
    rand_nonzero(hx, &rng);
    ECP h;
    ECP_generator(&h);
    PAIR_G1mul(&h, hx);

    // e = x + y*m mod r
    BIG e, t;
    BIG_modmul(t, y, m, r);
    BIG_copy(e, x);
    BIG_add(e, e, t);
    BIG_mod(e, r);
    BIG_norm(e);

    ECP s2;
    ECP_copy(&s2, &h);
    PAIR_G1mul(&s2, e);
    char sig[98];
    W.len = 0; ECP_toOctet(&W, &h, true);
    for (int i = 0; i < 49; i++) sig[i] = W.val[i];
    W.len = 0; ECP_toOctet(&W, &s2, true);
    for (int i = 0; i < 49; i++) sig[49 + i] = W.val[i];
    printf("\"signature\": \"%s\",\n", hex(sig, 98).c_str());

    // ---- randomnize ----
    BIG rr;
    rand_nonzero(rr, &rng);
    ECP rs1, rs2;
    ECP_copy(&rs1, &h);
    PAIR_G1mul(&rs1, rr);
    ECP_copy(&rs2, &s2);
    PAIR_G1mul(&rs2, rr);
    W.len = 0; ECP_toOctet(&W, &rs1, true);
    for (int i = 0; i < 49; i++) sig[i] = W.val[i];
    W.len = 0; ECP_toOctet(&W, &rs2, true);
    for (int i = 0; i < 49; i++) sig[49 + i] = W.val[i];
    printf("\"signature_rand\": \"%s\",\n", hex(sig, 98).c_str());

    // ---- verify: e(s1, X2 * Y2^m) == e(s2, g2) ----
    ECP2 acc;
    ECP2_copy(&acc, &Y2);
    PAIR_G2mul(&acc, m);
    ECP2_add(&acc, &X2);
    FP12 lhs, rhs;
    PAIR_ate(&lhs, &acc, &rs1);
    PAIR_fexp(&lhs);
    PAIR_ate(&rhs, &g2, &rs2);
    PAIR_fexp(&rhs);
    printf("\"verify\": %s\n", FP12_equals(&lhs, &rhs) ? "true" : "false");
    printf("}\n");
    return 0;
}
