"""Pure-Python golden mirror: scalar field / extension-field / curve / pairing.

This is the host-side bit-exact reference model for every TPU kernel, in the
same spirit as the reference's CPU mirrors of its CUDA kernels
(myzkp/examples/sumcheck/src/utils.rs:83-156).  It is also the production path
for verifier-side pairings (a handful of Fq12 ops — not worth a device
round-trip).

Covers the behavior of:
  - Ring/Field traits + FiniteFieldElement  (myzkp/src/modules/algebra/ring.rs:6-38,
    field.rs:69-110,210-278)
  - ExtendedFieldElement                    (myzkp/src/modules/algebra/efield.rs:95-151)
  - EllipticCurvePoint + Miller/Weil/Tate   (myzkp/src/modules/algebra/curve/curve.rs:17-392)
  - BN254 instantiation + optimal ate pairing (myzkp/src/modules/algebra/curve/bn128.rs)
"""

from __future__ import annotations

import hashlib
import random as _random
from dataclasses import dataclass


# ---------------------------------------------------------------------------
# Prime field
# ---------------------------------------------------------------------------

class PyField:
    """F_p with Python ints. Elements are `PyFp`."""

    def __init__(self, p: int):
        self.p = p

    def __call__(self, v) -> "PyFp":
        return PyFp(self, int(v) % self.p)

    def zero(self):
        return self(0)

    def one(self):
        return self(1)

    def random(self, rng: _random.Random | None = None):
        rng = rng or _random
        return self(rng.randrange(self.p))

    def sample(self, data: bytes) -> "PyFp":
        """Hash bytes to a field element (cap. parity: field.rs:272-278)."""
        return self(int.from_bytes(data, "big"))

    def __eq__(self, other):
        return isinstance(other, PyField) and other.p == self.p

    def __hash__(self):
        return hash(("PyField", self.p))

    def __repr__(self):
        return f"PyField({self.p})"


class PyFp:
    __slots__ = ("f", "v")

    def __init__(self, f: PyField, v: int):
        self.f = f
        self.v = v % f.p

    def _c(self, other):
        if isinstance(other, PyFp):
            return other
        if isinstance(other, int):
            return PyFp(self.f, other)
        return NotImplemented

    def __add__(self, o):
        o = self._c(o)
        return PyFp(self.f, self.v + o.v)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._c(o)
        return PyFp(self.f, self.v - o.v)

    def __rsub__(self, o):
        return self._c(o) - self

    def __mul__(self, o):
        o = self._c(o)
        return PyFp(self.f, self.v * o.v)

    __rmul__ = __mul__

    def __neg__(self):
        return PyFp(self.f, -self.v)

    def __pow__(self, e: int):
        e = int(e)
        if e < 0:
            return PyFp(self.f, pow(self.v, -1, self.f.p)) ** (-e)
        return PyFp(self.f, pow(self.v, e, self.f.p))

    def inv(self):
        return PyFp(self.f, pow(self.v, -1, self.f.p))

    def __truediv__(self, o):
        return self * self._c(o).inv()

    def __rtruediv__(self, o):
        return self._c(o) / self

    def __eq__(self, o):
        if isinstance(o, int):
            return self.v == o % self.f.p
        return isinstance(o, PyFp) and o.f == self.f and o.v == self.v

    def __hash__(self):
        return hash((self.f.p, self.v))

    def is_zero(self):
        return self.v == 0

    def __repr__(self):
        return f"{self.v}"

    def __int__(self):
        return self.v


# ---------------------------------------------------------------------------
# Extension field F_p[x]/(irreducible)
# ---------------------------------------------------------------------------

class PyExtField:
    """F_p[x]/(m(x)) with coefficients as a tuple of PyFp (low-first).

    Capability parity: ExtendedFieldElement (efield.rs:95-151), with the mul
    implemented as poly-mul + reduction by the monic irreducible.
    """

    def __init__(self, base: PyField, modulus_coeffs):
        # modulus_coeffs: low-first ints, length deg+1, leading coeff must be
        # invertible; normalize to monic.
        self.base = base
        lead = modulus_coeffs[-1] % base.p
        inv_lead = pow(lead, -1, base.p)
        self.mod = [c * inv_lead % base.p for c in modulus_coeffs]
        self.deg = len(self.mod) - 1

    def __call__(self, coeffs) -> "PyExt":
        if isinstance(coeffs, PyExt):
            return coeffs
        if isinstance(coeffs, (int, PyFp)):
            coeffs = [coeffs]
        ints = [c.v if isinstance(c, PyFp) else int(c) for c in coeffs]
        return PyExt(self, tuple(self._reduce(ints)))

    def _reduce(self, ints):
        """Reduce a low-first coefficient list mod the monic irreducible."""
        p = self.base.p
        cs = [c % p for c in ints]
        while len(cs) > self.deg:
            lead = cs.pop()
            if lead:
                k = len(cs) - self.deg  # x^{len(cs)} = x^k * x^{deg}
                for i in range(self.deg):
                    cs[k + i] = (cs[k + i] - lead * self.mod[i]) % p
        cs += [0] * (self.deg - len(cs))
        return [self.base(c) for c in cs]

    def zero(self):
        return self([0])

    def one(self):
        return self([1])

    def x(self):
        return self([0, 1])

    def random(self, rng=None):
        rng = rng or _random
        return self([rng.randrange(self.base.p) for _ in range(self.deg)])

    def __eq__(self, o):
        return (
            isinstance(o, PyExtField) and o.base == self.base and o.mod == self.mod
        )

    def __hash__(self):
        return hash(("PyExtField", self.base.p, tuple(self.mod)))


class PyExt:
    __slots__ = ("ef", "c")

    def __init__(self, ef: PyExtField, coeffs):
        self.ef = ef
        self.c = tuple(coeffs)

    def _c2(self, o):
        if isinstance(o, PyExt):
            return o
        if isinstance(o, (int, PyFp)):
            return self.ef([o])
        return NotImplemented

    def __add__(self, o):
        o = self._c2(o)
        return PyExt(self.ef, tuple(a + b for a, b in zip(self.c, o.c)))

    __radd__ = __add__

    def __sub__(self, o):
        o = self._c2(o)
        return PyExt(self.ef, tuple(a - b for a, b in zip(self.c, o.c)))

    def __rsub__(self, o):
        return self._c2(o) - self

    def __neg__(self):
        return PyExt(self.ef, tuple(-a for a in self.c))

    def __mul__(self, o):
        o = self._c2(o)
        d = self.ef.deg
        prod = [0] * (2 * d - 1)
        for i, a in enumerate(self.c):
            if a.v == 0:
                continue
            for j, b in enumerate(o.c):
                prod[i + j] += a.v * b.v
        return PyExt(self.ef, tuple(self.ef._reduce(prod)))

    __rmul__ = __mul__

    def __pow__(self, e: int):
        e = int(e)
        if e < 0:
            return self.inv() ** (-e)
        result = self.ef.one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def inv(self):
        """Extended Euclid over F_p[x] (parity: efield.rs:126-151)."""
        p = self.ef.base.p
        a = [c.v for c in self.c]
        m = list(self.ef.mod)
        g, s = _poly_ext_euclid(a, m, p)
        d = _poly_deg(g, p)
        if d != 0:
            raise ZeroDivisionError("not invertible")
        c_inv = pow(g[0], -1, p)
        out = [v * c_inv % p for v in s]
        return PyExt(self.ef, tuple(self.ef._reduce(out)))

    def __truediv__(self, o):
        return self * self._c2(o).inv()

    def __eq__(self, o):
        if isinstance(o, int):
            return self == self.ef([o])
        return isinstance(o, PyExt) and o.ef == self.ef and o.c == self.c

    def __hash__(self):
        return hash((self.ef.base.p, tuple(v.v for v in self.c)))

    def is_zero(self):
        return all(v.v == 0 for v in self.c)

    def __repr__(self):
        return f"Ext{[v.v for v in self.c]}"


def _poly_deg(a, p) -> int:
    for i in range(len(a) - 1, -1, -1):
        if a[i] % p:
            return i
    return -1


def _poly_divmod(a, b, p):
    """Long division of low-first int coefficient lists over F_p."""
    a = [x % p for x in a]
    db = _poly_deg(b, p)
    assert db >= 0
    inv_lead = pow(b[db], -1, p)
    q = [0] * max(1, len(a) - db)
    while _poly_deg(a, p) >= db:
        da = _poly_deg(a, p)
        c = a[da] * inv_lead % p
        q[da - db] = c
        for i in range(db + 1):
            a[da - db + i] = (a[da - db + i] - c * b[i]) % p
    return q, a


def _poly_ext_euclid(a, b, p):
    """Return (g, s) with s*a ≡ g (mod b), g = gcd(a, b), over F_p[x]."""
    r0, r1 = [x % p for x in a], [x % p for x in b]
    s0, s1 = [1], [0]
    while _poly_deg(r1, p) >= 0:
        q, r = _poly_divmod(r0, r1, p)
        r0, r1 = r1, r
        qs1 = [0] * (len(q) + len(s1))
        for i, qq in enumerate(q):
            if qq:
                for j, ss in enumerate(s1):
                    qs1[i + j] = (qs1[i + j] + qq * ss) % p
        ns = [0] * max(len(s0), len(qs1))
        for i in range(len(ns)):
            v0 = s0[i] if i < len(s0) else 0
            v1 = qs1[i] if i < len(qs1) else 0
            ns[i] = (v0 - v1) % p
        s0, s1 = s1, ns
    return r0, s0


# ---------------------------------------------------------------------------
# Elliptic curve (affine, host) + Miller loop pairings
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PyCurve:
    """Short Weierstrass y^2 = x^3 + a x + b over any Py field object."""

    a: object
    b: object

    def point(self, x, y) -> "PyPoint":
        return PyPoint(self, x, y, False)

    def infinity(self) -> "PyPoint":
        return PyPoint(self, None, None, True)

    def contains(self, x, y) -> bool:
        return y * y == x * x * x + self.a * x + self.b


class PyPoint:
    __slots__ = ("curve", "x", "y", "inf")

    def __init__(self, curve, x, y, inf=False):
        self.curve = curve
        self.x = x
        self.y = y
        self.inf = inf

    def __eq__(self, o):
        if not isinstance(o, PyPoint):
            return NotImplemented
        if self.inf or o.inf:
            return self.inf and o.inf
        return self.x == o.x and self.y == o.y

    def __hash__(self):
        return hash(("pt", self.inf, None if self.inf else (self.x, self.y)))

    def __neg__(self):
        if self.inf:
            return self
        return PyPoint(self.curve, self.x, -self.y)

    def __add__(self, o):
        # chord/tangent (parity: curve.rs:103-161)
        if self.inf:
            return o
        if o.inf:
            return self
        if self.x == o.x and self.y == -o.y:
            return self.curve.infinity()
        if self == o:
            lam = (3 * self.x * self.x + self.curve.a) / (2 * self.y)
        else:
            lam = (o.y - self.y) / (o.x - self.x)
        x3 = lam * lam - self.x - o.x
        y3 = lam * (self.x - x3) - self.y
        return PyPoint(self.curve, x3, y3)

    def __rmul__(self, k: int):
        return self * k

    def __mul__(self, k: int):
        k = int(k)
        if k < 0:
            return (-self) * (-k)
        acc = self.curve.infinity()
        add = self
        while k:
            if k & 1:
                acc = acc + add
            add = add + add
            k >>= 1
        return acc

    def __repr__(self):
        return "O" if self.inf else f"({self.x}, {self.y})"


def _one_like(x):
    """Multiplicative identity of x's field (works for PyFp and PyExt)."""
    return x ** 0


def line_slope(p: PyPoint, q: PyPoint):
    """Chord/tangent slope (parity: curve.rs:56-70)."""
    if p.x == q.x and p.y == q.y:
        return (3 * p.x * p.x + p.curve.a) / (2 * p.y)
    return (q.y - p.y) / (q.x - p.x)


def get_lambda(p: PyPoint, q: PyPoint, r: PyPoint):
    """Normalized Miller line function: line through P,Q over the vertical
    through P+Q, evaluated at R (parity: curve.rs:285-311)."""
    if p.inf or q.inf or r.inf:
        # caller guarantees at least one finite coordinate exists somewhere;
        # identity contribution
        for pt in (p, q, r):
            if not pt.inf:
                return _one_like(pt.x)
        raise ValueError("all points at infinity")
    if (p == q and p.y == 0) or (p != q and p.x == q.x):
        return r.x - p.x
    slope = line_slope(p, q)
    numerator = (r.y - p.y) - slope * (r.x - p.x)
    denominator = r.x + p.x + q.x - slope * slope
    return numerator / denominator


def miller(p: PyPoint, q: PyPoint, m: int):
    """Miller loop; returns (f_{m,P}(Q), [m]P) (parity: curve.rs:313-339)."""
    if p.inf or q.inf:
        return None, p.curve.infinity()
    if p == q:
        return _one_like(p.x), p
    one = _one_like(p.x)
    f = one
    t = p
    bits = bin(int(m))[2:]
    for bit in bits[1:]:
        f = f * f * get_lambda(t, t, q)
        t = t + t
        if bit == "1":
            f = f * get_lambda(t, p, q)
            t = t + p
    return f, t


def weil_pairing(p: PyPoint, q: PyPoint, m: int, s: PyPoint):
    """e(P,Q) via Weil reciprocity with auxiliary point S (curve.rs:341-358)."""
    if p.inf or q.inf:
        return _one_like(s.x)
    fp_qs, _ = miller(p, q + s, m)
    fp_s, _ = miller(p, s, m)
    fq_ps, _ = miller(q, p + (-s), m)
    fq_s, _ = miller(q, -s, m)
    return (fp_qs / fp_s) / (fq_ps / fq_s)


def tate_pairing(p: PyPoint, q: PyPoint, ell: int, k: int, field_order: int):
    """Reduced Tate pairing f^((q^k-1)/ell) (curve.rs:379-392)."""
    if p.inf or q.inf:
        return None
    f, _ = miller(p, q, ell)
    return f ** ((field_order**k - 1) // ell)


def general_tate_pairing(p: PyPoint, q: PyPoint, ell: int, k: int, field_order: int, s: PyPoint):
    """Tate with auxiliary S: f_{P}(Q+S)/f_{P}(S), reduced (curve.rs:360-377)."""
    if p.inf or q.inf:
        return None
    fp_qs, _ = miller(p, q + s, ell)
    fp_s, _ = miller(p, s, ell)
    return (fp_qs / fp_s) ** ((field_order**k - 1) // ell)
