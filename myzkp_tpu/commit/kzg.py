"""KZG polynomial commitment on BN254.

Capability parity with myzkp/src/modules/algebra/kzg.rs:
  - trusted setup (minimal or full G2 powers)            kzg.rs:27-55
  - commit = MSM over [s^i]G1                            kzg.rs:57-59
  - open: witness w = [(f - y)/(X - u)](s) * G1          kzg.rs:61-72
  - batch open (interpolate + vanishing-poly division)   kzg.rs:74-88
  - verify via pairings                                  kzg.rs:90-119
  - degree-bound proof / verify                          kzg.rs:121-144

TPU-first re-design: setup and every commitment/witness MSM run on device
(batched scalar-mul for the SRS, Pippenger for commitments) over Montgomery
limb arrays; the verifier's few pairings run host-side (python_field).
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..curves import bn254, msm as _msm, weierstrass as wst
from ..fields import limb
from ..fields.fp import Fp
from ..fields.python_field import PyPoint
from ..ops.poly import Poly, poly_divmod, lagrange_interpolate, from_monomials


@dataclass
class KZGPublicKey:
    """SRS: device G1/G2 power batches + lazily-converted host mirrors."""

    powers1: wst.Point  # (d+1,) G1 batch: [s^i] G1
    powers2: wst.Point  # (k,) G2 batch: [s^i] G2 (k=2 minimal, d+1 full)
    _host1: list = field(default=None, repr=False)
    _host2: list = field(default=None, repr=False)

    @property
    def degree(self) -> int:
        return self.powers1.x.shape[1] - 1

    def host_g1(self) -> list:
        if self._host1 is None:
            self._host1 = bn254.g1_points_to_host(self.powers1)
        return self._host1

    def host_g2(self) -> list:
        if self._host2 is None:
            self._host2 = bn254.g2_points_to_host(self.powers2)
        return self._host2


def _powers_of_s(s: int, n: int) -> list:
    acc, out = 1, []
    for _ in range(n):
        out.append(acc)
        acc = acc * s % bn254.R
    return out


def setup(degree: int, s: int | None = None, rng=None, full_g2: bool = False,
          ) -> KZGPublicKey:
    """Trusted setup with toxic waste s (parity: kzg.rs:27-55).

    [s^i]G1 for i<=degree and [s^i]G2 (i<=1 minimal, i<=degree full), computed
    as one batched device double-and-add over all powers at once.
    """
    if s is None:
        rng = rng or _random
        s = rng.randrange(1, bn254.R)
    pows1 = _powers_of_s(s, degree + 1)
    rspec = bn254.r_spec()

    F1, b31 = bn254.g1_ops(), bn254.g1_b3(())
    g1 = bn254.g1_points_to_device([bn254.g1_generator()] * (degree + 1))
    bits1 = _msm.scalar_bits(_msm.scalars_from_int(rspec, pows1))
    powers1 = wst.scalar_mul_bits(F1, b31, g1, bits1)

    n2 = degree + 1 if full_g2 else 2
    F2, b32 = bn254.g2_ops(), bn254.g2_b3(())
    g2 = bn254.g2_points_to_device([bn254.g2_generator()] * n2)
    bits2 = _msm.scalar_bits(_msm.scalars_from_int(rspec, pows1[:n2]))
    powers2 = wst.scalar_mul_bits(F2, b32, g2, bits2)
    return KZGPublicKey(powers1=powers1, powers2=powers2)


def _coef_scalars(p: Poly):
    """Poly coefficients (Montgomery Fp) -> standard-domain limb scalars."""
    return limb.from_mont(p.spec, p.coef.mont)


def _slice_points(pt: wst.Point, n: int) -> wst.Point:
    import jax

    return jax.tree_util.tree_map(lambda a: a[:, :n], pt)


def commit(pk: KZGPublicKey, p: Poly, method: str = "pippenger") -> PyPoint:
    """C = [p(s)] G1 as an MSM over the SRS (parity: kzg.rs:57-59)."""
    n = p.capacity
    assert n <= pk.degree + 1, "polynomial exceeds SRS degree"
    F, b3 = bn254.g1_ops(), bn254.g1_b3(())
    pt = _msm.msm(F, b3, _slice_points(pk.powers1, n), _coef_scalars(p),
                  method=method)
    return _to_host_single_g1(pt)


def commit_g2(pk: KZGPublicKey, p: Poly) -> PyPoint:
    """[p(s)] G2 over the full-G2 SRS (used by batch verification)."""
    n = p.capacity
    if n > pk.powers2.x[0].shape[1]:
        raise ValueError(
            f"G2 commitment of capacity {n} needs a full_g2 setup "
            f"(SRS has {pk.powers2.x[0].shape[1]} G2 powers)")
    F, b3 = bn254.g2_ops(), bn254.g2_b3(())
    pt = _msm.msm_naive(F, b3, _slice_points(pk.powers2, n), _coef_scalars(p))
    return _to_host_single_g2(pt)


def _to_host_single_g1(pt: wst.Point) -> PyPoint:
    import jax

    batched = jax.tree_util.tree_map(lambda a: a[:, None], pt)
    return bn254.g1_points_to_host(batched)[0]


def _to_host_single_g2(pt: wst.Point) -> PyPoint:
    import jax

    batched = jax.tree_util.tree_map(lambda a: a[:, None], pt)
    return bn254.g2_points_to_host(batched)[0]


def open(pk: KZGPublicKey, p: Poly, u: int) -> tuple[int, PyPoint]:
    """Evaluation proof at u: y = p(u), w = [(p - y)/(X - u)](s) G1.

    Parity: kzg.rs:61-72.  The quotient is one synthetic division (a fixed
    scan) and the witness is one MSM.
    """
    spec = p.spec
    u_fp = Fp.from_int(spec, u)
    y = p(u_fp)
    num = Poly(p.coef - Fp(spec, jnp.broadcast_to(
        _pad_scalar(y, p.capacity), p.coef.mont.shape)))
    divisor = Poly.from_int_coeffs(spec, [(-u) % spec.p, 1])
    q, _ = num.divmod(divisor, divisor_degree=1)
    w = commit(pk, q)
    return int(y.item()), w


def _pad_scalar(y: Fp, n: int):
    """Montgomery scalar y -> (L, n) array [y, 0, 0, ...]."""
    z = jnp.zeros((y.spec.L, n), dtype=jnp.uint32)
    return z.at[:, 0].set(y.mont)


def verify(pk: KZGPublicKey, u: int, y: int, commitment: PyPoint,
           witness: PyPoint) -> bool:
    """e(C - [y]G1, G2) == e(w, [s]G2 - [u]G2) (parity: kzg.rs:90-102)."""
    g1 = bn254.g1_generator()
    g2 = pk.host_g2()[0]
    s_g2 = pk.host_g2()[1]
    return bn254.pairing_product_is_one([
        (commitment + (-(g1 * y)), g2),
        (-witness, s_g2 + (-(g2 * u))),
    ])


def batch_open(pk: KZGPublicKey, p: Poly, us: list[int]
               ) -> tuple[list[int], PyPoint]:
    """Open at many points: proof = [(p - I)/Z](s) G1 where I interpolates
    the evaluations and Z is the vanishing polynomial (parity: kzg.rs:74-88)."""
    spec = p.spec
    xs = Fp.from_int(spec, us)
    ys = p.eval_domain(xs)
    i_coef = lagrange_interpolate(xs, ys)
    z_coef = from_monomials(xs)
    num = Poly(p.coef) - Poly(i_coef)
    q, _ = num.divmod(Poly(z_coef), divisor_degree=len(us))
    w = commit(pk, q)
    return [int(v) for v in ys.to_int()], w


def batch_verify(pk: KZGPublicKey, us: list[int], ys: list[int],
                 commitment: PyPoint, witness: PyPoint) -> bool:
    """e(C - [I(s)]G1, G2) == e(w, [Z(s)]G2) (parity: kzg.rs:104-119).

    Needs a full-G2 SRS for [Z(s)]G2; returns False (not an exception) on
    structurally invalid input — a verifier must reject, never crash
    (parity with fri.rs:258-405's reject-don't-panic discipline).
    """
    if not us or len(ys) != len(us) or len(set(u % bn254.R for u in us)) != len(us):
        return False
    if len(us) + 1 > pk.powers2.x[0].shape[1]:
        return False  # vanishing-poly G2 commitment needs full_g2 setup
    spec = bn254.r_spec()
    xs = Fp.from_int(spec, us)
    ysf = Fp.from_int(spec, ys)
    i_commit = commit(pk, Poly(lagrange_interpolate(xs, ysf)))
    z_g2 = commit_g2(pk, Poly(from_monomials(xs)))
    g2 = pk.host_g2()[0]
    return bn254.pairing_product_is_one([
        (commitment + (-i_commit), g2), (-witness, z_g2)])


def prove_degree_bound(pk: KZGPublicKey, p: Poly, d: int) -> PyPoint:
    """Commitment to X^(max_d - d) * p, proving deg(p) <= d against the SRS
    top (parity: kzg.rs:121-133; max_d is the SRS degree, d the claimed
    bound)."""
    max_d = pk.degree
    shift = max_d - d
    if shift < 0:
        raise ValueError(f"degree bound {d} exceeds SRS degree {max_d}")
    shifted = Poly(Fp(p.spec, jnp.pad(
        p.coef.mont[..., : d + 1], [(0, 0), (shift, 0)])))
    return commit(pk, shifted)


def verify_degree_bound(pk: KZGPublicKey, commitment: PyPoint,
                        degree_proof: PyPoint, d: int) -> bool:
    """e(proof, G2) == e(C, [s^(max_d-d)]G2) (parity: kzg.rs:135-144).

    Needs a full-G2 SRS; rejects (returns False) rather than crashing on a
    structurally invalid claimed bound.
    """
    max_d = pk.degree
    g2s = pk.host_g2()
    if d < 0 or not (0 <= max_d - d < len(g2s)):
        return False
    return bn254.pairing_product_is_one([
        (degree_proof, g2s[0]), (-commitment, g2s[max_d - d])])
