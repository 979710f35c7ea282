"""BN254 (alt_bn128 / EIP-197) instantiation: constants, host-side pairing,
and device-side G1/G2 batched point helpers.

Capability parity with myzkp/src/modules/algebra/curve/bn128.rs:
  - base field q, curve y^2 = x^3 + 3, ate loop count      (bn128.rs:19-27)
  - Fq2 = Fq[u]/(u^2+1), Fq12 = Fq[w]/(w^12 - 18 w^6 + 82) (bn128.rs:33-81)
  - G1 generator (1,2), hard-coded G2 generator            (bn128.rs:186-205)
  - twist_g2_to_g12 (x·w^2, y·w^3 with the -9 untwist)     (bn128.rs:98-145)
  - optimal_ate_pairing (Miller + 2 Frobenius line steps + final exp)
                                                           (bn128.rs:147-181)

Design split (TPU-first): prover-side group operations (MSM, batched scalar
mul) run on device over Montgomery limb arrays (weierstrass.py / msm.py);
the pairing itself is verifier-side — a handful of Fq12 ops on scalar values —
so it runs host-side on Python ints (python_field.py), like the reference's
advice that only the hot path needs the device.
"""

from __future__ import annotations

import functools

import numpy as np

from ..fields.python_field import (
    PyCurve,
    PyExt,
    PyExtField,
    PyField,
    PyPoint,
    get_lambda,
    miller,
)
from ..fields.spec import BN254_Q, BN254_R, FieldSpec
from . import weierstrass as wst
from .field_ops import FpOps, Fq2Ops
from ..fields import limb

# ---------------------------------------------------------------------------
# Constants (reference: bn128.rs:19-31, 186-212)
# ---------------------------------------------------------------------------

Q = BN254_Q  # base field modulus
R = BN254_R  # group order (scalar field)
ATE_LOOP_COUNT = 29793968203157093288  # bn128.rs:26

G1_X, G1_Y = 1, 2  # bn128.rs:186-188

G2_X = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
G2_Y = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

B1 = 3  # G1: y^2 = x^3 + 3

Fq = PyField(Q)
Fr = PyField(R)

# Fq2 = Fq[u]/(u^2+1)  (bn128.rs:33-49)
Fq2 = PyExtField(Fq, [1, 0, 1])
# Fq12 = Fq[w]/(w^12 - 18 w^6 + 82)  (bn128.rs:51-81)
Fq12 = PyExtField(Fq, [82] + [0] * 5 + [-18] + [0] * 5 + [1])

# G2 twist curve: y^2 = x^3 + 3/(9+u)  (bn128.rs:219-227)
_B2 = Fq2([3]) / Fq2([9, 1])
B2 = (_B2.c[0].v, _B2.c[1].v)

curve_g1 = PyCurve(Fq(0), Fq(3))
curve_g2 = PyCurve(Fq2([0]), Fq2(list(B2)))
curve_g12 = PyCurve(Fq12([0]), Fq12([3]))


def g1_generator() -> PyPoint:
    return curve_g1.point(Fq(G1_X), Fq(G1_Y))


def g2_generator() -> PyPoint:
    return curve_g2.point(Fq2(list(G2_X)), Fq2(list(G2_Y)))


# ---------------------------------------------------------------------------
# Host-side pairing (verifier path)
# ---------------------------------------------------------------------------

def cast_g1_to_g12(p: PyPoint) -> PyPoint:
    """Embed a G1 point into the Fq12 curve (parity: bn128.rs:84-98)."""
    if p.inf:
        return curve_g12.infinity()
    return curve_g12.point(Fq12([int(p.x)]), Fq12([int(p.y)]))


def twist_g2_to_g12(p: PyPoint) -> PyPoint:
    """Untwist a G2 point onto the Fq12 curve (parity: bn128.rs:98-145).

    With Fq2 = Fq[u]/(u^2+1) embedded in Fq12 via u = w^6 - 9, a coefficient
    pair (c0, c1) maps to (c0 - 9 c1) + c1 w^6; x then picks up w^2, y w^3.
    """
    if p.inf:
        return curve_g12.infinity()
    w = Fq12([0, 1])

    def embed(e: PyExt) -> PyExt:
        c0, c1 = e.c[0].v, e.c[1].v
        coeffs = [0] * 12
        coeffs[0] = (c0 - 9 * c1) % Q
        coeffs[6] = c1
        return Fq12(coeffs)

    nx = embed(p.x) * w**2
    ny = embed(p.y) * w**3
    return curve_g12.point(nx, ny)


@functools.lru_cache(maxsize=1)
def _final_exp_power() -> int:
    return (Q**12 - 1) // R


def optimal_ate_pairing(p_g1: PyPoint, q_g2: PyPoint) -> PyExt:
    """e(P, Q) in Fq12 (parity: bn128.rs:147-181).

    Routed through the native C++ tower engine when available (bit-exact with
    the pure-Python path below — same Miller shape and final exponent); the
    Python path is the golden fallback.
    """
    from .. import native as _native

    coeffs = _native.pairing_coeffs(p_g1, q_g2)
    if coeffs is not None:
        return Fq12(coeffs)
    return _optimal_ate_pairing_py(p_g1, q_g2)


def pairing_product_is_one(pairs) -> bool:
    """Check prod_i e(P_i, Q_i) == 1.

    With the native engine this is one multi-pairing (shared final
    exponentiation, the standard verifier optimization); the fallback
    multiplies individual pairings.  Verifier equalities e(A,B) == e(C,D)
    reduce to this via e(A,B) * e(-C,D) == 1.
    """
    from .. import native as _native

    coeffs = _native.multi_pairing_coeffs(pairs)
    if coeffs is not None:
        return coeffs == [1] + [0] * 11
    acc = Fq12([1])
    for p, q in pairs:
        acc = acc * optimal_ate_pairing(p, q)
    return acc == Fq12([1])


def _optimal_ate_pairing_py(p_g1: PyPoint, q_g2: PyPoint) -> PyExt:
    p = cast_g1_to_g12(p_g1)
    q = twist_g2_to_g12(q_g2)
    if p.inf or q.inf:
        return Fq12([1])
    f = Fq12([1])
    if p != q:
        f, r = miller(q, p, ATE_LOOP_COUNT)
        # Frobenius corrections (hard part of optimal ate)
        q1 = curve_g12.point(q.x**Q, q.y**Q)
        nq2 = curve_g12.point(q1.x**Q, -(q1.y**Q))
        f = f * get_lambda(r, q1, p)
        r = r + q1
        f = f * get_lambda(r, nq2, p)
    return f ** _final_exp_power()


# ---------------------------------------------------------------------------
# Device-side G1 / G2 (batched, Montgomery limbs)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def q_spec() -> FieldSpec:
    return FieldSpec.make(Q)


@functools.lru_cache(maxsize=1)
def r_spec() -> FieldSpec:
    return FieldSpec.make(R)


@functools.lru_cache(maxsize=1)
def g1_ops():
    """(FpOps over Fq, b3 const maker). b3 = 9 for b = 3."""
    return FpOps(q_spec())


@functools.lru_cache(maxsize=1)
def g2_ops():
    return Fq2Ops(q_spec())


def g1_b3(batch_shape=()):
    return g1_ops().const(9, batch_shape)


def g2_b3(batch_shape=()):
    b3 = (3 * B2[0] % Q, 3 * B2[1] % Q)
    return g2_ops().const(b3, batch_shape)


def g1_points_to_device(points) -> wst.Point:
    """List of host PyPoints (or (x,y) int pairs / None for inf) -> batch."""
    F = g1_ops()
    spec = q_spec()
    xs, ys, infs = [], [], []
    for p in points:
        if isinstance(p, PyPoint):
            inf, x, y = p.inf, (0 if p.inf else int(p.x)), (0 if p.inf else int(p.y))
        elif p is None:
            inf, x, y = True, 0, 0
        else:
            x, y = p
            inf = False
        xs.append(x % Q)
        ys.append(1 if inf else y % Q)
        infs.append(inf)
    x = limb.to_mont(spec, limb.from_int(spec, xs))
    y = limb.to_mont(spec, limb.from_int(spec, ys))
    z_mask = np.array(infs)
    one = F.one((len(points),))
    zero = F.zeros((len(points),))
    import jax.numpy as jnp

    m = jnp.asarray(z_mask)
    return wst.Point(
        F.select(m, zero, x), F.select(m, one, y), F.select(m, zero, one)
    )


def g2_points_to_device(points) -> wst.Point:
    F = g2_ops()
    spec = q_spec()
    c = {"x0": [], "x1": [], "y0": [], "y1": [], "inf": []}
    for p in points:
        if isinstance(p, PyPoint) or p is None:
            if p is None or p.inf:
                c["x0"].append(0); c["x1"].append(0)
                c["y0"].append(1); c["y1"].append(0)
                c["inf"].append(True)
            else:
                c["x0"].append(p.x.c[0].v); c["x1"].append(p.x.c[1].v)
                c["y0"].append(p.y.c[0].v); c["y1"].append(p.y.c[1].v)
                c["inf"].append(False)
        else:
            (x0, x1), (y0, y1) = p
            c["x0"].append(x0 % Q); c["x1"].append(x1 % Q)
            c["y0"].append(y0 % Q); c["y1"].append(y1 % Q)
            c["inf"].append(False)
    mk = lambda k: limb.to_mont(spec, limb.from_int(spec, c[k]))
    x = (mk("x0"), mk("x1"))
    y = (mk("y0"), mk("y1"))
    import jax.numpy as jnp

    m = jnp.asarray(np.array(c["inf"]))
    n = len(points)
    return wst.Point(
        F.select(m, F.zeros((n,)), x),
        F.select(m, F.one((n,)), y),
        F.select(m, F.zeros((n,)), F.one((n,))),
    )


def g1_points_to_host(pt: wst.Point, axis: int = 0):
    """Device G1 batch -> list of PyPoints (host)."""
    F = g1_ops()
    spec = q_spec()
    x, y, inf = wst.to_affine(F, pt, axis=axis)
    xi = limb.to_int(spec, np.asarray(limb.from_mont(spec, x)))
    yi = limb.to_int(spec, np.asarray(limb.from_mont(spec, y)))
    infn = np.asarray(inf)
    out = []
    for k in range(infn.shape[0]):
        if infn[k]:
            out.append(curve_g1.infinity())
        else:
            out.append(curve_g1.point(Fq(int(xi[k])), Fq(int(yi[k]))))
    return out


def g2_points_to_host(pt: wst.Point, axis: int = 0):
    F = g2_ops()
    spec = q_spec()
    x, y, inf = wst.to_affine(F, pt, axis=axis)
    cvt = lambda a: limb.to_int(spec, np.asarray(limb.from_mont(spec, a)))
    x0, x1, y0, y1 = cvt(x[0]), cvt(x[1]), cvt(y[0]), cvt(y[1])
    infn = np.asarray(inf)
    out = []
    for k in range(infn.shape[0]):
        if infn[k]:
            out.append(curve_g2.infinity())
        else:
            out.append(
                curve_g2.point(
                    Fq2([int(x0[k]), int(x1[k])]), Fq2([int(y0[k]), int(y1[k])])
                )
            )
    return out
