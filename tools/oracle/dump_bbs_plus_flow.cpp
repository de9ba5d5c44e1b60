// Oracle for the BBS+ flow (examples/bbs-plus/test.cpp: seed "seed",
// setup(16), message "Hello, BBS+!"): wrapper algorithm + draw order from
// examples/bbs-plus/src/bbs+.cpp:6-73.
#include "oracle_util.hpp"

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t N = 16;

    // ---- setup(16): g1, g2, h0, h[16] ----
    ECP g1, h0;
    ECP2 g2;
    ECP h[N];
    rand_g1(&g1, &rng);
    rand_g2(&g2, &rng);
    rand_g1(&h0, &rng);
    for (size_t i = 0; i < N; i++) rand_g1(&h[i], &rng);

    printf("{\n");
    printf("\"g1\": \"%s\",\n", ser_g1(&g1).c_str());
    printf("\"g2\": \"%s\",\n", ser_g2(&g2).c_str());
    printf("\"h0\": \"%s\",\n", ser_g1(&h0).c_str());
    printf("\"h\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_g1(&h[i]).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- key_gen ----
    BIG gamma;
    rand_nonzero(gamma, &rng);
    ECP2 w;
    ECP2_copy(&w, &g2);
    PAIR_G2mul(&w, gamma);
    printf("\"sk\": \"%s\",\n", ser_zp(gamma).c_str());
    printf("\"pk\": \"%s\",\n", ser_g2(&w).c_str());

    // ---- sign("Hello, BBS+!"): m = encode, [x, r] = select_in<Zp^2> ----
    const char* msg = "Hello, BBS+!";
    std::vector<Big> m;
    auto mhex = encode_to_zp_hex(msg, strlen(msg), &m);
    printf("\"message\": [");
    for (size_t i = 0; i < mhex.size(); i++)
        printf("\"%s\"%s", mhex[i].c_str(), i + 1 < mhex.size() ? ", " : "");
    printf("],\n");

    BIG x, r;
    rand_zp(x, &rng);
    rand_zp(r, &rng);

    // A = (g1 * h0^r * prod h_i^m_i)^(1/(gamma+x))
    ECP base;
    ECP_copy(&base, &g1);
    ECP t;
    ECP_copy(&t, &h0);
    PAIR_G1mul(&t, r);
    ECP_add(&base, &t);
    for (size_t i = 0; i < m.size(); i++) {
        ECP ti;
        ECP_copy(&ti, &h[i]);
        PAIR_G1mul(&ti, m[i].v);
        ECP_add(&base, &ti);
    }
    BIG e, einv;
    zp_add(e, gamma, x);
    zp_inv(einv, e);
    ECP A;
    ECP_copy(&A, &base);
    PAIR_G1mul(&A, einv);
    printf("\"signature_A\": \"%s\",\n", ser_g1(&A).c_str());
    printf("\"signature_x\": \"%s\",\n", ser_zp(x).c_str());
    printf("\"signature_r\": \"%s\",\n", ser_zp(r).c_str());

    // ---- verify ----
    ECP2 wx;
    ECP2_copy(&wx, &g2);
    PAIR_G2mul(&wx, x);
    ECP2_add(&wx, &w);
    FP12 lhs, rhs;
    ate(&lhs, &A, &wx);
    ate(&rhs, &base, &g2);
    printf("\"verify\": %s\n", FP12_equals(&lhs, &rhs) ? "true" : "false");
    printf("}\n");
    return 0;
}
