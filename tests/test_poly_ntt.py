"""Polynomial + NTT tests (parity: polynomial.rs / ntt.rs test modules)."""

import random

import pytest

from myzkp_tpu.fields.fp import Fp
from myzkp_tpu.fields.spec import BN254_R, M128, FieldSpec
from myzkp_tpu.ops import ntt as N
from myzkp_tpu.ops.poly import (
    Poly,
    from_monomials,
    lagrange_interpolate,
    poly_divmod,
    poly_eval,
    powers,
)

P_SMALL = 3221225473  # 3 * 2^30 + 1, NTT-friendly


def _randlist(p, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(p) for _ in range(n)]


def test_ntt_matches_naive_eval():
    """NTT(coeffs) == naive evaluation at w^i (parity: ntt.rs:347-360)."""
    p, n = P_SMALL, 16
    spec = FieldSpec.make(p)
    coeffs = _randlist(p, n)
    w = N.nth_root_of_unity(p, n)
    assert pow(w, n, p) == 1 and pow(w, n // 2, p) != 1
    got = list(N.ntt(Fp.from_int(spec, coeffs)).to_int())
    want = [sum(c * pow(w, i * j, p) for j, c in enumerate(coeffs)) % p for i in range(n)]
    assert got == want


@pytest.mark.parametrize("p", [P_SMALL, M128, BN254_R])
def test_ntt_intt_roundtrip(p):
    spec = FieldSpec.make(p)
    coeffs = _randlist(p, 8, seed=p % 97)
    a = Fp.from_int(spec, coeffs)
    assert list(N.intt(N.ntt(a)).to_int()) == coeffs


def test_reference_roots_of_unity():
    """The reference's hard-coded roots are reproduced (fri.rs:408-473)."""
    assert N.nth_root_of_unity(M128, 1 << 119) == 85408008396924667383611388730472331217
    M64 = (1 << 64) - (1 << 32) + 1
    assert pow(N.nth_root_of_unity(M64, 1 << 32), 1 << 32, M64) == 1
    assert pow(N.nth_root_of_unity(M64, 1 << 32), 1 << 31, M64) != 1
    # the reference's value 1753635133440165772 is *a* primitive 2^32 root:
    r = 1753635133440165772
    assert pow(r, 1 << 32, M64) == 1 and pow(r, 1 << 31, M64) != 1


def test_fast_multiply_matches_schoolbook():
    p = P_SMALL
    spec = FieldSpec.make(p)
    ca, cb = _randlist(p, 7, 1), _randlist(p, 9, 2)
    want = [0] * 15
    for i, x in enumerate(ca):
        for j, y in enumerate(cb):
            want[i + j] = (want[i + j] + x * y) % p
    got = list(N.fast_multiply(Fp.from_int(spec, ca), Fp.from_int(spec, cb)).to_int())
    assert got == want
    got2 = list((Poly.from_int_coeffs(spec, ca) * Poly.from_int_coeffs(spec, cb)).to_int())
    assert got2 == want


def test_eval_and_powers():
    p = P_SMALL
    spec = FieldSpec.make(p)
    ca = _randlist(p, 7, 3)
    ev = poly_eval(Fp.from_int(spec, ca), Fp.from_int(spec, [3, 5, 0, 1]))
    want = [sum(c * pow(x, i, p) for i, c in enumerate(ca)) % p for x in [3, 5, 0, 1]]
    assert list(ev.to_int()) == want
    pw = powers(Fp.from_int(spec, 7), 9)
    assert list(pw.to_int()) == [pow(7, i, p) for i in range(9)]


def test_divmod_exact_and_with_remainder():
    p = P_SMALL
    spec = FieldSpec.make(p)
    ca, cb = _randlist(p, 7, 4), _randlist(p, 5, 5)
    pa, pb = Poly.from_int_coeffs(spec, ca), Poly.from_int_coeffs(spec, cb)
    prod = pa * pb
    q, r = poly_divmod(prod.coef, pb.coef, 4)
    assert list(q.to_int())[:7] == ca
    assert all(v == 0 for v in r.to_int())
    # with remainder: a = q*b + r
    q, r = poly_divmod(pa.coef, pb.coef, 4)
    qb = N.fast_multiply(q, pb.coef)
    recon = [(int(x) + int(y)) % p for x, y in zip(list(qb.to_int()) + [0] * 9, list(r.to_int()) + [0] * 9)]
    assert recon[:7] == ca


def test_zerofier_and_interpolate_known_vector():
    """Lagrange through (1,0),(2,3),(3,8) = x^2 - 1 (polynomial.rs:783-803)."""
    p = P_SMALL
    spec = FieldSpec.make(p)
    xs = Fp.from_int(spec, [1, 2, 3])
    assert list(from_monomials(xs).to_int()) == [(-6) % p, 11, (-6) % p, 1]
    co = lagrange_interpolate(xs, Fp.from_int(spec, [0, 3, 8]))
    assert list(co.to_int()) == [(-1) % p, 0, 1]


def test_interpolate_random_roundtrip():
    p = BN254_R
    spec = FieldSpec.make(p)
    xs_i = list(range(1, 9))
    ys_i = _randlist(p, 8, 6)
    xs, ys = Fp.from_int(spec, xs_i), Fp.from_int(spec, ys_i)
    co = lagrange_interpolate(xs, ys)
    back = poly_eval(co, xs)
    assert list(back.to_int()) == ys_i


def test_coset_evaluate_divide():
    """fast_coset_evaluate/interpolate roundtrip (parity: ntt.rs:254-330)."""
    p = P_SMALL
    spec = FieldSpec.make(p)
    ca = _randlist(p, 7, 7)
    a = Fp.from_int(spec, ca)
    ev = N.coset_evaluate(a, 5, 16)
    w = N.nth_root_of_unity(p, 16)
    want = [
        sum(c * pow(5 * pow(w, i, p) % p, j, p) for j, c in enumerate(ca)) % p
        for i in range(16)
    ]
    assert list(ev.to_int()) == want
    back = N.coset_interpolate(ev, 5)
    assert list(back.to_int())[:7] == ca


def test_poly_scale_and_pow():
    p = P_SMALL
    spec = FieldSpec.make(p)
    pa = Poly.from_int_coeffs(spec, [1, 2, 3])
    # scale: p(cx) (parity: polynomial.rs:167-174)
    sc = pa.scale(4)
    assert list(sc.to_int()) == [1, 8, 48]
    sq = pa ** 2
    want = [1, 4, 10, 12, 9]
    assert list(sq.to_int())[:5] == want


def test_geometric_series_device_path_matches_host():
    """Above _GEOMETRIC_DEVICE_MIN_N the series is built on device by
    log-doubling (host tables become 100+ MB HLO constants at 2^21 —
    the round-3 QAP bench HTTP 500); both paths must agree bit-for-bit."""
    import numpy as np

    from myzkp_tpu.fields.spec import FieldSpec
    from myzkp_tpu.ops import ntt as nt

    spec = FieldSpec.make(3221225473)
    n = nt._GEOMETRIC_DEVICE_MIN_N  # device path
    c = 12345
    got = np.asarray(nt._geometric_mont(spec, c, n))
    want = nt._geometric_mont_np(spec, c, n)
    assert np.array_equal(got, want)
    # non-power-of-two length slices correctly — compare the FULL n+3
    # series incl. the tail of the log-doubled table (advisor r3)
    got2 = np.asarray(nt._geometric_mont(spec, c, n + 3))
    want2 = nt._geometric_mont_np(spec, c, n + 3)
    assert np.array_equal(got2, want2)
