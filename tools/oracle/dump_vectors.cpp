// Golden-vector generator.
//
// Links against a local out-of-tree build of the *reference's* vendored
// MIRACL-core library (never copied into this repo) and dumps deterministic
// test vectors + ROM constants as JSON.  The TPU framework's tests assert
// bit-identical behaviour against these vectors (SURVEY §4: the reference's
// seeded-CSPRNG determinism is its de-facto golden-vector mechanism).
//
// Build (see tools/oracle/build.sh):
//   g++ -std=c++17 -I$REF/3rd-party dump_vectors.cpp $BUILD/libcrypto12381.a
//
// Output: JSON on stdout -> tests/vectors/reference.json

#include <cstdio>
#include <cstring>
#include <string>

#include "miracl-core/pair_BLS12381.h"
#include "miracl-core/randapi.h"

using namespace core;
using namespace B384_58;
using namespace BLS12381;

static std::string hex(const char* data, int len) {
    static const char* d = "0123456789abcdef";
    std::string out;
    for (int i = 0; i < len; i++) {
        unsigned char c = (unsigned char)data[i];
        out += d[c >> 4];
        out += d[c & 15];
    }
    return out;
}

static std::string big_hex(BIG b) {
    char buf[48];
    BIG n;
    BIG_copy(n, b);
    BIG_toBytes(buf, n);
    return hex(buf, 48);
}

static std::string oct_hex(octet* o) { return hex(o->val, o->len); }

int main() {
    printf("{\n");

    // ---- ROM constants ------------------------------------------------
    {
        BIG t;
        BIG_rcopy(t, Modulus);
        printf("\"p\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Order);
        printf("\"r\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Cof);
        printf("\"cof_eff\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Gx);
        printf("\"g1x\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Gy);
        printf("\"g1y\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Pxa);
        printf("\"g2xa\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Pxb);
        printf("\"g2xb\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Pya);
        printf("\"g2ya\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Pyb);
        printf("\"g2yb\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Ad);
        printf("\"iso_a\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_Bd);
        printf("\"iso_b\": \"%s\",\n", big_hex(t).c_str());
        BIG_rcopy(t, CURVE_HTPC);
        printf("\"htpc\": \"%s\",\n", big_hex(t).c_str());
        // 11-isogeny coefficient table, in consumption order
        printf("\"pc\": [");
        for (int i = 0; i < 53; i++) {
            BIG_rcopy(t, PC[i]);
            printf("\"%s\"%s", big_hex(t).c_str(), i + 1 < 53 ? "," : "");
        }
        printf("],\n");
    }

    // ---- CSPRNG stream ------------------------------------------------
    {
        csprng rng;
        char seed[] = "seed";
        octet so{4, 4, seed};
        CREATE_CSPRNG(&rng, &so);
        char stream[64];
        for (int i = 0; i < 64; i++) stream[i] = (char)RAND_byte(&rng);
        printf("\"rand_stream_seed\": \"%s\",\n", hex(stream, 64).c_str());

        // fresh engine: BIG_randomnum mod r sequence (as the wrapper's
        // select_in<Zp> does)
        csprng rng2;
        CREATE_CSPRNG(&rng2, &so);
        BIG r, v;
        BIG_rcopy(r, CURVE_Order);
        printf("\"randomnum_r\": [");
        for (int i = 0; i < 4; i++) {
            BIG_randomnum(v, r, &rng2);
            printf("\"%s\"%s", big_hex(v).c_str(), i < 3 ? "," : "");
        }
        printf("],\n");
    }

    // ---- serialization ------------------------------------------------
    char wbuf[1024];
    octet W{0, sizeof(wbuf), wbuf};
    {
        ECP g;
        ECP_generator(&g);
        W.len = 0;
        ECP_toOctet(&W, &g, true);
        printf("\"g1_gen_ser\": \"%s\",\n", oct_hex(&W).c_str());

        ECP g2p;
        ECP_copy(&g2p, &g);
        ECP_dbl(&g2p);
        W.len = 0;
        ECP_toOctet(&W, &g2p, true);
        printf("\"g1_2g_ser\": \"%s\",\n", oct_hex(&W).c_str());

        BIG e;
        BIG_zero(e);
        BIG_inc(e, 12345);
        BIG_norm(e);
        ECP ge;
        ECP_copy(&ge, &g);
        PAIR_G1mul(&ge, e);
        W.len = 0;
        ECP_toOctet(&W, &ge, true);
        printf("\"g1_12345g_ser\": \"%s\",\n", oct_hex(&W).c_str());
    }
    {
        ECP2 h;
        ECP2_generator(&h);
        W.len = 0;
        ECP2_toOctet(&W, &h, true);
        printf("\"g2_gen_ser\": \"%s\",\n", oct_hex(&W).c_str());

        BIG e;
        BIG_zero(e);
        BIG_inc(e, 12345);
        BIG_norm(e);
        ECP2 he;
        ECP2_copy(&he, &h);
        PAIR_G2mul(&he, e);
        W.len = 0;
        ECP2_toOctet(&W, &he, true);
        printf("\"g2_12345h_ser\": \"%s\",\n", oct_hex(&W).c_str());
    }
    {
        // pairing vectors
        ECP g;
        ECP2 h;
        ECP_generator(&g);
        ECP2_generator(&h);
        FP12 f;
        PAIR_ate(&f, &h, &g);
        PAIR_fexp(&f);
        W.len = 0;
        FP12_toOctet(&W, &f);
        printf("\"gt_e_g1_g2\": \"%s\",\n", oct_hex(&W).c_str());

        BIG a, b;
        BIG_zero(a); BIG_inc(a, 7); BIG_norm(a);
        BIG_zero(b); BIG_inc(b, 11); BIG_norm(b);
        ECP ga; ECP_copy(&ga, &g); PAIR_G1mul(&ga, a);
        ECP2 hb; ECP2_copy(&hb, &h); PAIR_G2mul(&hb, b);
        FP12 fab;
        PAIR_ate(&fab, &hb, &ga);
        PAIR_fexp(&fab);
        W.len = 0;
        FP12_toOctet(&W, &fab);
        printf("\"gt_e_7g_11h\": \"%s\",\n", oct_hex(&W).c_str());

        // GT pow: e(g,h)^5
        FP12 f5;
        BIG e5;
        BIG_zero(e5); BIG_inc(e5, 5); BIG_norm(e5);
        FP12_copy(&f5, &f);
        FP12_pow(&f5, &f5, e5);
        W.len = 0;
        FP12_toOctet(&W, &f5);
        printf("\"gt_e_pow5\": \"%s\",\n", oct_hex(&W).c_str());

        // double ate: e(2g, h) * e(g, 3h)
        ECP g2x; ECP_copy(&g2x, &g); ECP_dbl(&g2x);
        BIG th; BIG_zero(th); BIG_inc(th, 3); BIG_norm(th);
        ECP2 h3; ECP2_copy(&h3, &h); PAIR_G2mul(&h3, th);
        FP12 fd;
        PAIR_double_ate(&fd, &h, &g2x, &h3, &g);
        PAIR_fexp(&fd);
        W.len = 0;
        FP12_toOctet(&W, &fd);
        printf("\"gt_double_ate\": \"%s\",\n", oct_hex(&W).c_str());
    }
    {
        // SHA3-512 of "abc"
        sha3 sh;
        SHA3_init(&sh, SHA3_HASH512);
        const char* msg = "abc";
        for (int i = 0; i < 3; i++) SHA3_process(&sh, msg[i]);
        char d[64];
        SHA3_hash(&sh, d);
        printf("\"sha3_512_abc\": \"%s\",\n", hex(d, 64).c_str());

        // hash-to-Zp path: big2 from 64 bytes, ctdmod by r with 512-255 bits
        DBIG db;
        BIG_dfromBytesLen(db, d, 64);
        BIG r, out;
        BIG_rcopy(r, CURVE_Order);
        BIG_ctdmod(out, db, r, 64 * 8 - 255);
        printf("\"hash_zp_abc\": \"%s\",\n", big_hex(out).c_str());

        // hash-to-G1 path (wrapper g1_point.hpp:203-218): mod p, nres,
        // map2point, cfp
        DBIG db2;
        BIG_dfromBytesLen(db2, d, 64);
        BIG m, x;
        BIG_rcopy(m, Modulus);
        BIG_ctdmod(x, db2, m, 64 * 8 - 381);
        FP fx;
        FP_nres(&fx, x);
        ECP pt;
        ECP_map2point(&pt, &fx);
        W.len = 0;
        ECP_toOctet(&W, &pt, true);
        printf("\"map2point_abc_precfp\": \"%s\",\n", oct_hex(&W).c_str());
        ECP_cfp(&pt);
        W.len = 0;
        ECP_toOctet(&W, &pt, true);
        printf("\"hash_g1_abc\": \"%s\",\n", oct_hex(&W).c_str());

        // map2point of the field element 5 (pre- and post-cfp)
        FP f5;
        FP_from_int(&f5, 5);
        ECP p5;
        ECP_map2point(&p5, &f5);
        W.len = 0;
        ECP_toOctet(&W, &p5, true);
        printf("\"map2point_5_precfp\": \"%s\",\n", oct_hex(&W).c_str());
        ECP_cfp(&p5);
        W.len = 0;
        ECP_toOctet(&W, &p5, true);
        printf("\"map2point_5\": \"%s\"\n", oct_hex(&W).c_str());
    }

    printf("}\n");
    return 0;
}
