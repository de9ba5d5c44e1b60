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
