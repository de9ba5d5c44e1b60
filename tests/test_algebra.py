"""Symbolic DSL tests mirroring the reference's algebra_test.cpp:6-48
(the reference's checks are constexpr; here they are runtime asserts with
the same expressions)."""

from crypto12381_tpu.api.algebra import (Prod, Sum, Symbol, algebraic,
                                         sequence, subscript, substitute,
                                         symbols)


def test_symbol_substitution():
    x, y = symbols("x y")
    f = x + y - 1
    ff = f(x, y)                 # substituting symbols is the identity
    assert ff(1, 2) == 2         # 1 + 2 - 1
    f2 = f(x.be(y + 3))          # x = y+3 -> 2y + 2
    assert f2(y.be(5)) == 12


def test_ranged_substitution():
    x, y = symbols("x y")
    f2 = (x + y - 1)(x.be(y + 3))
    rng = f2(y.in_[1, 3])
    assert rng[0] == 4           # 2*1 + 2
    assert rng[1] == 6           # 2*2 + 2


def test_symbolic_subscript_and_ranges():
    x, i = symbols("x i")
    arr = algebraic([1, 2, 3, 4, 5])
    rr = (arr[i] + arr[i + 1])(i.in_[0, x])(x.be(3))
    assert rr[2] == 3 + 4
    arr3 = (arr[4 - i])(i.in_[0, 5])
    assert arr3[1] == 4
    ccc = arr[i](i.in_[x])(x.be(3))
    assert ccc[1] == 2


def test_except():
    x, i = symbols("x i")
    arr = algebraic([1, 2, 3, 4, 5])
    s = arr[i](i.in_[2].except_(x))(x.be(1))
    assert s[0] == 1             # i in {0,1} \ {1} = {0}


def test_subscript_substitute_functions():
    i = Symbol("i")
    arr = algebraic([10, 20, 30])
    arri = subscript(arr, i)
    assert substitute(arri, i=0) == 10
    assert subscript(arr, 2) == 30


def test_sum_prod():
    i, j = symbols("i j")
    arr = algebraic([1, 2, 3, 4])
    assert Sum[4](arr[i]) == 10
    assert Prod[i.in_[1, 5]](i) == 24
    assert Sum[i.in_[4].except_(2)](arr[i]) == 1 + 2 + 4
    # Lagrange-style nested use
    xs = [1, 3, 4]
    lam0 = Prod[j.in_(range(3)).except_(0)]((-xs[1] if False else 1))
    assert lam0 == 1


def test_multi_range_nesting_last_outermost():
    ii, k = symbols("ii k")
    table = (ii * 10 + k)(ii.in_[2], k.in_[3])
    # last range (k) outermost: table[k][ii]
    assert table[2][1] == 1 * 10 + 2
    assert table[0][0] == 0


def test_sequence_adaptors():
    s = sequence(5).filter(lambda v: v % 2 == 0).transform(lambda v: v * v)
    assert s.materialize() == [0, 4, 16]
    assert sequence(2, 5).materialize() == [2, 3, 4]
    assert algebraic([1, 2, 3]).except_(2).materialize() == [1, 3]


def test_symbolic_sum_prod_in_sets():
    """sum_/product_ accept DSL Sum/Prod-style (expr, range) forms."""
    from crypto12381_tpu.api.algebra import algebraic, symbols
    from crypto12381_tpu.api.elements import ZpNumber
    from crypto12381_tpu.api.sets import product_, sum_

    i_, = symbols("i_")
    vals = algebraic([ZpNumber(v) for v in (3, 5, 7, 11)])
    assert sum_(vals[i_], i_.in_[4]) == ZpNumber(26)
    assert sum_(vals[i_], i_.in_[1, 4]) == ZpNumber(23)
    assert product_(vals[i_], i_.in_[4].except_(2)) == ZpNumber(165)
    # nested subscripts rows[k][col] defer until every index binds
    rows = algebraic([[ZpNumber(1), ZpNumber(2)], [ZpNumber(3), ZpNumber(4)]])
    k_, = symbols("k_")
    assert sum_(rows[k_][1], k_.in_[2]) == ZpNumber(6)


def test_symbolic_g1_pow_product_fuses():
    from crypto12381_tpu.api.algebra import algebraic, symbols
    from crypto12381_tpu.api.elements import G1Element, ZpNumber
    from crypto12381_tpu.api.sets import product_

    g = G1Element.generator()
    i_, = symbols("i_")
    es = algebraic([ZpNumber(2), ZpNumber(3), ZpNumber(4)])
    sym = product_(g ** es[i_], i_.in_[3])
    ref = (g ** 2).point() * (g ** 3) * (g ** 4)
    assert sym == ref


def test_packed_struct_parse_serialize():
    """Struct-typed parse/serialize (ref set.hpp:114-293)."""
    from crypto12381_tpu.api.sets import (G1, Zp, SerializedPack, packed,
                                          parse, serialize)
    from crypto12381_tpu.api.sets import create_random_engine, select_in

    @packed
    class Sig:
        h = G1
        s = G1
        e = Zp

    r = create_random_engine("packed")
    h = select_in(G1, r).point()
    s = select_in(G1, r).point()
    e = select_in(Zp, r)
    blob = serialize(h, s, e)
    assert isinstance(blob, SerializedPack) and isinstance(blob, bytes)
    assert Sig.SERIALIZED_SIZE == 49 + 49 + 48 == len(blob)
    # serialize(...).to(Struct) re-types the pack
    sig = blob.to(Sig)
    assert sig.h == h and sig.s == s and sig.e == e
    # parse(Struct, data) and instance round-trip
    sig2 = parse(Sig, bytes(blob))
    assert sig2 == sig
    assert bytes(sig2.serialize()) == bytes(blob)
