// Oracle for the BBS flow (examples/bbs/test.cpp: seed "seed", setup(16),
// message "Hello, BBS!"): replicates the wrapper's algorithm + RNG draw
// order (examples/bbs/src/bbs.cpp:5-74) on MIRACL-core and dumps every
// serialized artifact for byte-exact comparison with the Python scheme.
#include "oracle_util.hpp"

int main() {
    csprng rng;
    char seedstr[] = "seed";
    octet so{4, 4, seedstr};
    CREATE_CSPRNG(&rng, &so);

    const size_t N = 16;

    // ---- setup(16): g1, g2, h[16] ----
    ECP g1;
    ECP2 g2;
    ECP h[N];
    rand_g1(&g1, &rng);
    rand_g2(&g2, &rng);
    for (size_t i = 0; i < N; i++) rand_g1(&h[i], &rng);

    printf("{\n");
    printf("\"g1\": \"%s\",\n", ser_g1(&g1).c_str());
    printf("\"g2\": \"%s\",\n", ser_g2(&g2).c_str());
    printf("\"h\": [");
    for (size_t i = 0; i < N; i++)
        printf("\"%s\"%s", ser_g1(&h[i]).c_str(), i + 1 < N ? ", " : "");
    printf("],\n");

    // ---- key_gen: gamma (*Zp), w = g2^gamma ----
    BIG gamma;
    rand_nonzero(gamma, &rng);
    ECP2 w;
    ECP2_copy(&w, &g2);
    PAIR_G2mul(&w, gamma);
    printf("\"sk\": \"%s\",\n", ser_zp(gamma).c_str());
    printf("\"pk\": \"%s\",\n", ser_g2(&w).c_str());

    // ---- encode_message("Hello, BBS!") ----
    const char* msg = "Hello, BBS!";
    std::vector<Big> m;
    auto mhex = encode_to_zp_hex(msg, strlen(msg), &m);
    printf("\"message\": [");
    for (size_t i = 0; i < mhex.size(); i++)
        printf("\"%s\"%s", mhex[i].c_str(), i + 1 < mhex.size() ? ", " : "");
    printf("],\n");

    // ---- sign: x (plain Zp), A = (g1 * prod h_i^m_i)^(1/(gamma+x)) ----
    BIG x;
    rand_zp(x, &rng);
    ECP base;
    ECP_copy(&base, &g1);
    for (size_t i = 0; i < m.size(); i++) {
        ECP t;
        ECP_copy(&t, &h[i]);
        PAIR_G1mul(&t, m[i].v);
        ECP_add(&base, &t);
    }
    BIG e, einv;
    zp_add(e, gamma, x);
    zp_inv(einv, e);
    ECP A;
    ECP_copy(&A, &base);
    PAIR_G1mul(&A, einv);
    printf("\"signature_A\": \"%s\",\n", ser_g1(&A).c_str());
    printf("\"signature_x\": \"%s\",\n", ser_zp(x).c_str());

    // ---- verify: e(A, w*g2^x) == e(g1 * prod h_i^m_i, g2) ----
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
