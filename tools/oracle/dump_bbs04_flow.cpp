// Oracle for the BBS04 group-signature flow (examples/bbs04/test.cpp:
// seed "seed", key_gen(4), sign with gsk[2], message = the 10-byte span
// "hello bbs" INCLUDING the string literal's NUL terminator): wrapper
// algorithm + draw order from examples/bbs04/src/bbs.cpp:5-87.
#include "oracle_util.hpp"

// hash(...).to(Zp): SHA3-512 over the serialized arguments, 64-byte digest
// -> DBIG -> fixed-time mod r (set.hpp:317-389, zp_number.hpp:417-426)
struct Hasher {
    sha3 sh;
    Hasher() { SHA3_init(&sh, SHA3_HASH512); }
    void bytes(const char* d, int n) {
        for (int i = 0; i < n; i++) SHA3_process(&sh, d[i]);
    }
    void g1(ECP* p) {
        char buf[100];
        octet W{0, sizeof(buf), buf};
        ECP_toOctet(&W, p, true);
        bytes(W.val, W.len);
    }
    void gt(FP12* f) {
        char buf[600];
        octet W{0, sizeof(buf), buf};
        FP12_toOctet(&W, f);
        bytes(W.val, W.len);
    }
    void to_zp(BIG out) {
        char dig[64];
        SHA3_hash(&sh, dig);
        DBIG dm;
        BIG_dfromBytesLen(dm, dig, 64);
        BIG r;
        BIG_rcopy(r, CURVE_Order);
        BIG_ctdmod(out, dm, r, 64 * 8 - 255);
    }
};

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t N = 4;

    // ---- key_gen(4): draws g1, h (*G1^2), g2 (*G2), xi1, xi2, gamma ----
    ECP g1, h;
    ECP2 g2;
    rand_g1(&g1, &rng);
    rand_g1(&h, &rng);
    rand_g2(&g2, &rng);
    BIG xi1, xi2, gamma;
    rand_nonzero(xi1, &rng);
    rand_nonzero(xi2, &rng);
    rand_nonzero(gamma, &rng);

    BIG inv1, inv2;
    zp_inv(inv1, xi1);
    zp_inv(inv2, xi2);
    ECP u, v;
    ECP_copy(&u, &h);
    PAIR_G1mul(&u, inv1);
    ECP_copy(&v, &h);
    PAIR_G1mul(&v, inv2);
    ECP2 w;
    ECP2_copy(&w, &g2);
    PAIR_G2mul(&w, gamma);

    Big xs[N];
    ECP As[N];
    for (size_t i = 0; i < N; i++) {
        rand_nonzero(xs[i].v, &rng);
        BIG gx, gxi;
        zp_add(gx, gamma, xs[i].v);
        zp_inv(gxi, gx);
        ECP_copy(&As[i], &g1);
        PAIR_G1mul(&As[i], gxi);
    }

    printf("{\n");
    printf("\"gpk\": \"%s%s%s%s%s%s\",\n", ser_g1(&g1).c_str(),
           ser_g2(&g2).c_str(), ser_g1(&h).c_str(), ser_g1(&u).c_str(),
           ser_g1(&v).c_str(), ser_g2(&w).c_str());
    printf("\"gmsk\": \"%s%s\",\n", ser_zp(xi1).c_str(), ser_zp(xi2).c_str());
    printf("\"gsk\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s%s\"%s", ser_g1(&As[i]).c_str(), ser_zp(xs[i].v).c_str(),
               i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- sign(gpk, gsk[2], "hello bbs"): 7 plain-Zp draws ----
    const char msg[] = "hello bbs";        // 10 bytes incl. NUL
    const int msglen = 10;
    ECP A;
    ECP_copy(&A, &As[2]);
    BIG x;
    BIG_copy(x, xs[2].v);

    BIG al, be, ra, rb, rx, rd1, rd2;
    rand_zp(al, &rng);
    rand_zp(be, &rng);
    rand_zp(ra, &rng);
    rand_zp(rb, &rng);
    rand_zp(rx, &rng);
    rand_zp(rd1, &rng);
    rand_zp(rd2, &rng);

    ECP T1, T2, T3, t;
    ECP_copy(&T1, &u);
    PAIR_G1mul(&T1, al);
    ECP_copy(&T2, &v);
    PAIR_G1mul(&T2, be);
    BIG ab;
    zp_add(ab, al, be);
    ECP_copy(&T3, &h);
    PAIR_G1mul(&T3, ab);
    ECP_add(&T3, &A);

    ECP R1, R2, R4, R5;
    ECP_copy(&R1, &u);
    PAIR_G1mul(&R1, ra);
    ECP_copy(&R2, &v);
    PAIR_G1mul(&R2, rb);

    // R3 = e(T3^rx * h^-(rd1+rd2), g2) * e(h^-(ra+rb), w)
    BIG rd12, nrd12, rab, nrab;
    zp_add(rd12, rd1, rd2);
    zp_neg(nrd12, rd12);
    zp_add(rab, ra, rb);
    zp_neg(nrab, rab);
    ECP p1;
    ECP_copy(&p1, &T3);
    PAIR_G1mul(&p1, rx);
    ECP_copy(&t, &h);
    PAIR_G1mul(&t, nrd12);
    ECP_add(&p1, &t);
    ECP p2;
    ECP_copy(&p2, &h);
    PAIR_G1mul(&p2, nrab);
    FP12 e1, e2, R3;
    ate(&e1, &p1, &g2);
    ate(&e2, &p2, &w);
    FP12_copy(&R3, &e1);
    FP12_mul(&R3, &e2);

    // R4 = T1^rx * u^-rd1 ; R5 = T2^rx * v^-rd2
    BIG nrd1, nrd2;
    zp_neg(nrd1, rd1);
    zp_neg(nrd2, rd2);
    ECP_copy(&R4, &T1);
    PAIR_G1mul(&R4, rx);
    ECP_copy(&t, &u);
    PAIR_G1mul(&t, nrd1);
    ECP_add(&R4, &t);
    ECP_copy(&R5, &T2);
    PAIR_G1mul(&R5, rx);
    ECP_copy(&t, &v);
    PAIR_G1mul(&t, nrd2);
    ECP_add(&R5, &t);

    BIG c;
    {
        Hasher H;
        H.bytes(msg, msglen);
        H.g1(&T1);
        H.g1(&T2);
        H.g1(&T3);
        H.g1(&R1);
        H.g1(&R2);
        H.gt(&R3);
        H.g1(&R4);
        H.g1(&R5);
        H.to_zp(c);
    }

    BIG sa, sb, sx, sd1, sd2, cx, tt;
    zp_mul(tt, c, al);
    zp_add(sa, ra, tt);
    zp_mul(tt, c, be);
    zp_add(sb, rb, tt);
    zp_mul(cx, c, x);
    zp_add(sx, rx, cx);
    zp_mul(tt, al, cx);
    zp_add(sd1, rd1, tt);
    zp_mul(tt, be, cx);
    zp_add(sd2, rd2, tt);

    printf("\"signature\": \"%s%s%s%s%s%s%s%s%s\",\n",
           ser_g1(&T1).c_str(), ser_g1(&T2).c_str(), ser_g1(&T3).c_str(),
           ser_zp(c).c_str(), ser_zp(sa).c_str(), ser_zp(sb).c_str(),
           ser_zp(sx).c_str(), ser_zp(sd1).c_str(), ser_zp(sd2).c_str());

    // ---- verify ----
    BIG nc, nsd1, nsd2, nsab, sab, nsd12;
    zp_neg(nc, c);
    zp_neg(nsd1, sd1);
    zp_neg(nsd2, sd2);
    zp_add(sab, sa, sb);
    zp_neg(nsab, sab);
    zp_add(nsd12, nsd1, nsd2);

    ECP V1, V2, V4, V5;
    ECP_copy(&V1, &u);
    PAIR_G1mul(&V1, sa);
    ECP_copy(&t, &T1);
    PAIR_G1mul(&t, nc);
    ECP_add(&V1, &t);
    ECP_copy(&V2, &v);
    PAIR_G1mul(&V2, sb);
    ECP_copy(&t, &T2);
    PAIR_G1mul(&t, nc);
    ECP_add(&V2, &t);

    // V3 = e(T3^sx * h^(nsd1+nsd2) / g1^c, g2) * e(h^-(sa+sb) * T3^c, w)
    ECP q1;
    ECP_copy(&q1, &T3);
    PAIR_G1mul(&q1, sx);
    ECP_copy(&t, &h);
    PAIR_G1mul(&t, nsd12);
    ECP_add(&q1, &t);
    ECP_copy(&t, &g1);
    PAIR_G1mul(&t, c);
    ECP_neg(&t);
    ECP_add(&q1, &t);
    ECP q2;
    ECP_copy(&q2, &h);
    PAIR_G1mul(&q2, nsab);
    ECP_copy(&t, &T3);
    PAIR_G1mul(&t, c);
    ECP_add(&q2, &t);
    FP12 f1, f2, V3;
    ate(&f1, &q1, &g2);
    ate(&f2, &q2, &w);
    FP12_copy(&V3, &f1);
    FP12_mul(&V3, &f2);

    ECP_copy(&V4, &T1);
    PAIR_G1mul(&V4, sx);
    ECP_copy(&t, &u);
    PAIR_G1mul(&t, nsd1);
    ECP_add(&V4, &t);
    ECP_copy(&V5, &T2);
    PAIR_G1mul(&V5, sx);
    ECP_copy(&t, &v);
    PAIR_G1mul(&t, nsd2);
    ECP_add(&V5, &t);

    BIG c2;
    {
        Hasher H;
        H.bytes(msg, msglen);
        H.g1(&T1);
        H.g1(&T2);
        H.g1(&T3);
        H.g1(&V1);
        H.g1(&V2);
        H.gt(&V3);
        H.g1(&V4);
        H.g1(&V5);
        H.to_zp(c2);
    }
    printf("\"verify\": %s,\n", BIG_comp(c, c2) == 0 ? "true" : "false");

    // ---- open: a = T3 / (T1^xi1 * T2^xi2); trace signer index ----
    ECP tr;
    ECP_copy(&tr, &T1);
    PAIR_G1mul(&tr, xi1);
    ECP_copy(&t, &T2);
    PAIR_G1mul(&t, xi2);
    ECP_add(&tr, &t);
    ECP_neg(&tr);
    ECP_add(&tr, &T3);
    printf("\"opened\": \"%s\",\n", ser_g1(&tr).c_str());
    int idx = -1;
    for (size_t i = 0; i < N; i++)
        if (ECP_equals(&tr, &As[i])) idx = (int)i;
    printf("\"opened_index\": %d\n", idx);
    printf("}\n");
    return 0;
}
