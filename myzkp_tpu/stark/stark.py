"""STARK prover/verifier (slow variant: Lagrange interpolation).

Capability parity with myzkp/src/modules/zkstark/stark.rs:
  - Trace/Boundary/TransitionConstraints types      stark.rs:18-20
  - StarkProof {fri_proof, bqc_*, rdc_*}            stark.rs:21-29
  - Stark params + degree-bound helpers             stark.rs:31-129
  - sample_weights (Blake2b per index)              stark.rs:131-144
  - prove: randomizer rows -> per-register trace interpolation -> boundary
    quotients -> Merkle commitments -> symbolic AIR evaluation -> transition
    quotients -> randomizer polynomial -> weighted nonlinear combination ->
    FRI -> duplicated-index openings                stark.rs:146-321
  - verify: recompute weights, FRI verify, Merkle checks, per-index AIR and
    combination recomputation                       stark.rs:323-471
  - initialize_stark_m128 factory                   stark.rs:474-515

TPU re-design: the trace interpolation is ONE batched Lagrange solve over all
registers (shared zerofier), codewords are coset-NTT evaluations, and the
nonlinear combination is a vectorized weighted sum over coefficient arrays;
only the Merkle/transcript/per-query-index verification logic runs host-side.
"""

from __future__ import annotations

import hashlib
import random as _random
from dataclasses import dataclass

import jax.numpy as jnp

from ..fields import limb
from ..fields.fp import Fp
from ..fields.spec import M128, FieldSpec
from ..ops import ntt as _ntt
from ..ops.mpoly import MPoly
from ..ops.poly import Poly, lagrange_interpolate, poly_divmod
from ..utils import merkle
from ..utils.fiat_shamir import FiatShamirTransformer
from .fri import (FRI, FriProof, _host_eval, _host_interpolate, _int_from_le,
                  codeword_bytes, sample_field)


@dataclass
class StarkProof:
    fri_proof: FriProof
    bqc_roots: list
    bqc_points: list  # list[bytes]
    bqc_paths: list
    rdc_root: bytes
    rdc_points: list
    rdc_paths: list


class Stark:
    def __init__(self, expansion_factor: int, num_colinearity_checks: int,
                 security_level: int, num_randomizers: int, num_registers: int,
                 original_trace_length: int, generator: int, omega: int,
                 omicron: int, omicron_domain: list[int], fri: FRI,
                 spec: FieldSpec):
        self.expansion_factor = expansion_factor
        self.num_colinearity_checks = num_colinearity_checks
        self.security_level = security_level
        self.num_randomizers = num_randomizers
        self.num_registers = num_registers
        self.original_trace_length = original_trace_length
        self.generator = generator
        self.omega = omega
        self.omicron = omicron
        self.omicron_domain = omicron_domain
        self.fri = fri
        self.spec = spec

    # -- degree bookkeeping (parity: stark.rs:46-129) ------------------------
    def transition_degree_bounds(self, air: list[MPoly]) -> list[int]:
        point_degrees = [1] + [
            self.original_trace_length + self.num_randomizers - 1
        ] * (2 * self.num_registers)
        out = []
        for a in air:
            out.append(max(
                (sum(r * e for r, e in zip(point_degrees, k)) for k in a.d),
                default=0))
        return out

    def transition_quotient_degree_bounds(self, air) -> list[int]:
        return [d - (self.original_trace_length - 1)
                for d in self.transition_degree_bounds(air)]

    def max_degree(self, air) -> int:
        md = max(self.transition_quotient_degree_bounds(air))
        return (1 << md.bit_length()) - 1

    def transition_zerofier_points(self) -> list[int]:
        return self.omicron_domain[: self.original_trace_length - 1]

    def transition_zerofier(self) -> Poly:
        from ..ops.poly import from_monomials

        return Poly(from_monomials(
            Fp.from_int(self.spec, self.transition_zerofier_points())))

    def boundary_zerofiers(self, boundary) -> list[list[int]]:
        """Per-register zerofier coefficients (host ints)."""
        p = self.spec.p
        out = []
        for s in range(self.num_registers):
            pts = [pow(self.omicron, c, p) for c, r, v in boundary if r == s]
            out.append(_host_zerofier(pts, p))
        return out

    def boundary_interpolants(self, boundary) -> list[list[int]]:
        p = self.spec.p
        out = []
        for s in range(self.num_registers):
            dom = [pow(self.omicron, c, p) for c, r, v in boundary if r == s]
            vals = [v % p for c, r, v in boundary if r == s]
            out.append(_host_interpolate(dom, vals, p) if dom else [0])
        return out

    def boundary_quotient_degree_bounds(self, randomized_trace_length,
                                        boundary) -> list[int]:
        rtd = randomized_trace_length - 1
        return [rtd - (len(z) - 1) for z in self.boundary_zerofiers(boundary)]

    def sample_weights(self, number: int, randomness: bytes) -> list[int]:
        """Parity: stark.rs:131-144."""
        out = []
        for i in range(number):
            h = hashlib.blake2b(
                randomness + i.to_bytes(8, "little"), digest_size=32
            ).digest()
            out.append(sample_field(self.spec, h))
        return out

    # -- prove (parity: stark.rs:146-321) ------------------------------------
    def prove(self, trace: list[list[int]], boundary, air: list[MPoly],
              rng=None) -> StarkProof:
        spec = self.spec
        p = spec.p
        rng = rng or _random
        proof_stream = FiatShamirTransformer()

        trace = [list(row) for row in trace]
        for _ in range(self.num_randomizers):
            trace.append([rng.randrange(p) for _ in range(self.num_registers)])

        # batched trace interpolation: (registers, trace_len) values
        tlen = len(trace)
        tdomain = [pow(self.omicron, i, p) for i in range(tlen)]
        xs = Fp.from_int(spec, tdomain)
        ys = Fp.from_int(spec, [[trace[c][s] for c in range(tlen)]
                                for s in range(self.num_registers)])
        trace_polys = Fp(spec, lagrange_interpolate(xs, ys).mont)  # (S, tlen)

        # boundary quotients (device divisions, per register)
        interpolants = self.boundary_interpolants(boundary)
        zerofiers = self.boundary_zerofiers(boundary)
        bq_polys = []
        for s in range(self.num_registers):
            tp = Poly(Fp(spec, trace_polys.mont[:, s]))
            ip = Poly.from_int_coeffs(spec, interpolants[s]).pad_to(tlen)
            z = Poly.from_int_coeffs(spec, zerofiers[s])
            q, _ = (tp - ip).divmod(z, divisor_degree=len(zerofiers[s]) - 1)
            bq_polys.append(q)

        # commit to boundary quotient codewords on the FRI domain
        n_fri = self.fri.domain_length
        bq_codewords, bqc_roots, bqc_leaves = [], [], []
        for s in range(self.num_registers):
            cw = _ntt.coset_evaluate(bq_polys[s].coef, self.generator, n_fri)
            bq_codewords.append(cw)
            leaves = codeword_bytes(cw)
            bqc_leaves.append(leaves)
            root = merkle.commit(leaves)
            bqc_roots.append(root)
            proof_stream.push([root])

        # symbolic AIR composition
        x_poly = Poly.from_int_coeffs(spec, [0, 1])
        points = [x_poly]
        for s in range(self.num_registers):
            points.append(Poly(Fp(spec, trace_polys.mont[:, s])))
        for s in range(self.num_registers):
            points.append(
                Poly(Fp(spec, trace_polys.mont[:, s])).scale(
                    Fp.from_int(spec, self.omicron)))
        transition_polys = [a.evaluate_symbolic(points) for a in air]

        # transition quotients
        tz = self.transition_zerofier()
        tz_deg = self.original_trace_length - 1
        transition_quotients = []
        for tp in transition_polys:
            q, _ = tp.divmod(tz, divisor_degree=tz_deg)
            transition_quotients.append(q)

        # randomizer polynomial
        md = self.max_degree(air)
        rand_coeffs = [rng.randrange(p) for _ in range(md + 1)]
        randomizer_poly = Poly.from_int_coeffs(spec, rand_coeffs)
        rand_cw = _ntt.coset_evaluate(randomizer_poly.coef, self.generator, n_fri)
        rand_leaves = codeword_bytes(rand_cw)
        rdc_root = merkle.commit(rand_leaves)
        proof_stream.push([rdc_root])

        # nonlinear combination
        weights = self.sample_weights(
            1 + 2 * len(transition_quotients) + 2 * len(bq_polys),
            proof_stream.prover_fiat_shamir(32))
        tq_bounds = self.transition_quotient_degree_bounds(air)
        bq_bounds = self.boundary_quotient_degree_bounds(tlen, boundary)

        cap = md + 1
        terms = [randomizer_poly.pad_to(cap)]
        for i, tq in enumerate(transition_quotients):
            terms.append(tq.pad_to(cap))
            terms.append(_shift_poly(tq, md - tq_bounds[i], cap))
        for i, bq in enumerate(bq_polys):
            terms.append(bq.pad_to(cap))
            terms.append(_shift_poly(bq, md - bq_bounds[i], cap))
        combination = Poly.zero(spec, cap)
        for w, t in zip(weights, terms):
            combination = combination + t.scale_const(Fp.from_int(spec, w))

        combined_codeword = _ntt.coset_evaluate(
            combination.coef, self.generator, n_fri)

        # FRI + duplicated-index openings
        fri_proof = self.fri.prove(combined_codeword)
        fri_proof.top_level_indices.sort()
        duplicated = list(fri_proof.top_level_indices)
        for i in fri_proof.top_level_indices:
            duplicated.append((i + self.expansion_factor) % n_fri)
        for i in list(duplicated):
            duplicated.append((i + n_fri // 2) % n_fri)
        duplicated.sort()

        bqc_points, bqc_paths = [], []
        for s in range(self.num_registers):
            tree = merkle.MerkleTree(bqc_leaves[s])
            for i in duplicated:
                bqc_points.append(bqc_leaves[s][i])
                bqc_paths.append(tree.open(i))
        rdc_points, rdc_paths = [], []
        rtree = merkle.MerkleTree(rand_leaves)
        for i in duplicated:
            rdc_points.append(rand_leaves[i])
            rdc_paths.append(rtree.open(i))

        return StarkProof(
            fri_proof=fri_proof, bqc_roots=bqc_roots, bqc_points=bqc_points,
            bqc_paths=bqc_paths, rdc_root=rdc_root, rdc_points=rdc_points,
            rdc_paths=rdc_paths)

    # -- verify (parity: stark.rs:323-471) -----------------------------------
    def verify(self, proof: StarkProof, air: list[MPoly], boundary) -> bool:
        spec = self.spec
        p = spec.p
        proof_stream = FiatShamirTransformer()

        original_trace_length = 1 + max(c for c, r, v in boundary)
        randomized_trace_length = original_trace_length + self.num_randomizers

        for bqr in proof.bqc_roots:
            proof_stream.push([bqr])
        proof_stream.push([proof.rdc_root])

        weights = self.sample_weights(
            1 + 2 * len(air) + 2 * self.num_registers,
            proof_stream.prover_fiat_shamir(32))

        polynomial_values: list = []
        if not self.fri.verify(proof.fri_proof, polynomial_values):
            return False
        polynomial_values.sort(key=lambda iv: iv[0])
        indices = [i for i, _ in polynomial_values]
        values = [v for _, v in polynomial_values]

        n_fri = self.fri.domain_length
        duplicated = list(indices)
        for i in indices:
            duplicated.append((i + self.expansion_factor) % n_fri)
        duplicated = sorted(duplicated)

        # structural validation: reject malformed proofs instead of crashing
        leaf_w = 2 * spec.L
        nd = len(duplicated)
        if len(proof.bqc_roots) != self.num_registers or not all(
                isinstance(r, bytes) and len(r) == 32
                for r in proof.bqc_roots):
            return False
        if not check_openings(proof.bqc_points, proof.bqc_paths,
                              self.num_registers * nd, leaf_w):
            return False
        if not check_openings(proof.rdc_points, proof.rdc_paths, nd, leaf_w):
            return False

        # boundary quotient leafs
        leafs = []
        ctr = 0
        for r in range(len(proof.bqc_roots)):
            tmp = {}
            for i in duplicated:
                tmp[i] = proof.bqc_points[ctr]
                if not merkle.verify(proof.bqc_roots[r], i,
                                     proof.bqc_paths[ctr], tmp[i]):
                    return False
                ctr += 1
            leafs.append(tmp)

        randomizer = {}
        for ctr, i in enumerate(duplicated):
            randomizer[i] = proof.rdc_points[ctr]
            if not merkle.verify(proof.rdc_root, i, proof.rdc_paths[ctr],
                                 randomizer[i]):
                return False

        # per-index AIR / combination re-evaluation (host ints)
        interpolants = self.boundary_interpolants(boundary)
        zerofiers = self.boundary_zerofiers(boundary)
        tz_points = self.transition_zerofier_points()
        tq_bounds = self.transition_quotient_degree_bounds(air)
        bq_bounds = self.boundary_quotient_degree_bounds(
            randomized_trace_length, boundary)
        md = self.max_degree(air)

        for i in range(len(indices)):
            current_index = indices[i]
            dci = self.generator * pow(self.omega, current_index, p) % p
            next_index = (current_index + self.expansion_factor) % n_fri
            dni = self.generator * pow(self.omega, next_index, p) % p
            current_trace = [0] * self.num_registers
            next_trace = [0] * self.num_registers
            for s in range(self.num_registers):
                zc = _host_eval(zerofiers[s], dci, p)
                zn = _host_eval(zerofiers[s], dni, p)
                ic = _host_eval(interpolants[s], dci, p)
                inx = _host_eval(interpolants[s], dni, p)
                cur = _int_from_le(leafs[s][current_index])
                nxt = _int_from_le(leafs[s][next_index])
                current_trace[s] = (cur * zc + ic) % p
                next_trace[s] = (nxt * zn + inx) % p

            point = [dci] + current_trace + next_trace
            tcv = [a.evaluate(point) for a in air]

            tz_val = 1
            for pt in tz_points:
                tz_val = tz_val * (dci - pt) % p
            tz_inv = pow(tz_val, -1, p)

            terms = [_int_from_le(randomizer[current_index])]
            for s in range(len(tcv)):
                quotient = tcv[s] * tz_inv % p
                terms.append(quotient)
                terms.append(quotient * pow(dci, md - tq_bounds[s], p) % p)
            for s in range(self.num_registers):
                bqv = _int_from_le(leafs[s][current_index])
                terms.append(bqv)
                terms.append(bqv * pow(dci, md - bq_bounds[s], p) % p)
            combination = 0
            for w, t in zip(weights, terms):
                combination = (combination + w * t) % p
            if combination != values[i] % p:
                return False
        return True


def check_openings(points, paths, n: int, leaf_w: int) -> bool:
    """Structural validation of a (points, paths) opening list: exactly n
    leaf byte-strings of width leaf_w with 32-byte-hash auth paths.  Keeps
    malformed proofs on the clean-reject path (the reference's verifier
    returns failures rather than panicking, stark.rs:323-471)."""
    if not isinstance(points, (list, tuple)) or len(points) != n:
        return False
    if not isinstance(paths, (list, tuple)) or len(paths) != n:
        return False
    if not all(isinstance(v, bytes) and len(v) == leaf_w for v in points):
        return False
    from .fri import _path_ok

    return all(_path_ok(pp, leaf_w) for pp in paths)


def _shift_poly(q: Poly, shift: int, cap: int) -> Poly:
    """x^shift * q, padded/truncated to capacity cap."""
    m = jnp.pad(q.coef.mont, [(0, 0), (shift, 0)])
    m = m[..., :cap]
    if m.shape[-1] < cap:
        m = jnp.pad(m, [(0, 0), (0, cap - m.shape[-1])])
    return Poly(Fp(q.spec, m))


def _host_zerofier(points: list[int], p: int) -> list[int]:
    coeffs = [1]
    for x in points:
        nc = [0] * (len(coeffs) + 1)
        for k, c in enumerate(coeffs):
            nc[k] = (nc[k] - c * x) % p
            nc[k + 1] = (nc[k + 1] + c) % p
        coeffs = nc
    return coeffs


def initialize_stark_m128(expansion_factor: int, num_colinearity_checks: int,
                          security_level: int, num_registers: int,
                          num_cycles: int, transition_constraints_degree: int
                          ) -> Stark:
    """Parity: stark.rs:474-515."""
    spec = FieldSpec.make(M128)
    generator = 85408008396924667383611388730472331217
    num_randomizers = 4 * num_colinearity_checks
    randomized_trace_length = num_cycles + num_randomizers
    omicron_domain_length = 1 << (
        randomized_trace_length * transition_constraints_degree
    ).bit_length()
    fri_domain_length = omicron_domain_length * expansion_factor
    omega = _ntt.nth_root_of_unity(M128, fri_domain_length)
    omicron = _ntt.nth_root_of_unity(M128, omicron_domain_length)
    omicron_domain = []
    acc = 1
    for _ in range(omicron_domain_length):
        omicron_domain.append(acc)
        acc = acc * omicron % M128
    fri = FRI(offset=generator, omega=omega, domain_length=fri_domain_length,
              expansion_factor=expansion_factor,
              num_colinearity_tests=num_colinearity_checks, spec=spec)
    return Stark(
        expansion_factor=expansion_factor,
        num_colinearity_checks=num_colinearity_checks,
        security_level=security_level, num_randomizers=num_randomizers,
        num_registers=num_registers, original_trace_length=num_cycles,
        generator=generator, omega=omega, omicron=omicron,
        omicron_domain=omicron_domain, fri=fri, spec=spec)
