"""FastStark: NTT-accelerated STARK with preprocessed transition zerofier.

Capability parity with myzkp/src/modules/zkstark/fast_stark.rs:
  - preprocess: transition zerofier -> coset codeword -> Merkle root,
    moved out of the verifier                       fast_stark.rs:52-75
  - prove: fast_interpolate for the trace (:209-214), fast_coset_evaluate
    codewords (:231-236,282-287,329-334), fast_coset_divide transition
    quotients (:262-273), proof additionally carries tzc points/paths
    (:30-31,374-383)
  - verify: checks tzc openings against the preprocessed root (:480-498)
    and uses the *verified zerofier leaf values* for the quotients (the
    reference re-evaluates the zerofier locally at :543 even after checking
    the openings; using the committed values is the intended optimization
    and is what the preprocessed commitment exists for)
  - initialize_fast_stark_m128 factory              fast_stark.rs:573-616
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass

from ..fields.fp import Fp
from ..fields.spec import M128, FieldSpec
from ..ops import ntt as _ntt
from ..ops.mpoly import MPoly
from ..ops.poly import Poly
from ..utils import merkle
from ..utils.fiat_shamir import FiatShamirTransformer
from .fri import FRI, _int_from_le, codeword_bytes, _host_eval
from .stark import Stark, StarkProof, _shift_poly, check_openings


@dataclass
class FastStarkProof(StarkProof):
    tzc_points: list = None
    tzc_paths: list = None


class FastStark(Stark):
    # -- preprocessing (parity: fast_stark.rs:52-75) -------------------------
    def preprocess(self):
        """Returns (tz_poly, tz_codeword, tz_root, tz_leaves)."""
        spec = self.spec
        pts = Fp.from_int(spec, self.transition_zerofier_points())
        tz = Poly(_ntt.fast_zerofier(pts))
        tz_codeword = _ntt.fast_coset_evaluate(
            tz.coef, self.generator, self.fri.domain_length)
        tz_leaves = codeword_bytes(tz_codeword)
        tz_root = merkle.commit(tz_leaves)
        return tz, tz_codeword, tz_root, tz_leaves

    # -- prove (parity: fast_stark.rs:177-396) -------------------------------
    def prove(self, trace: list[list[int]], boundary, air: list[MPoly],
              preprocessed=None, rng=None) -> FastStarkProof:
        spec = self.spec
        p = spec.p
        rng = rng or _random
        if preprocessed is None:
            preprocessed = self.preprocess()
        tz, tz_codeword, tz_root, tz_leaves = preprocessed
        proof_stream = FiatShamirTransformer()

        trace = [list(row) for row in trace]
        for _ in range(self.num_randomizers):
            trace.append([rng.randrange(p) for _ in range(self.num_registers)])

        tlen = len(trace)
        tdomain = [pow(self.omicron, i, p) for i in range(tlen)]
        xs = Fp.from_int(spec, tdomain)
        ys = Fp.from_int(spec, [[trace[c][s] for c in range(tlen)]
                                for s in range(self.num_registers)])
        # D&C interpolation, batched over registers via the shared tree
        trace_coef = _ntt.fast_interpolate(xs, ys)  # (S, tlen)

        interpolants = self.boundary_interpolants(boundary)
        zerofiers = self.boundary_zerofiers(boundary)
        bq_polys = []
        for s in range(self.num_registers):
            tp = Poly(Fp(spec, trace_coef.mont[:, s]))
            ip = Poly.from_int_coeffs(spec, interpolants[s]).pad_to(tlen)
            z = Poly.from_int_coeffs(spec, zerofiers[s])
            q, _ = (tp - ip).divmod(z, divisor_degree=len(zerofiers[s]) - 1)
            bq_polys.append(q)

        n_fri = self.fri.domain_length
        bq_codewords, bqc_roots, bqc_leaves = [], [], []
        for s in range(self.num_registers):
            cw = _ntt.fast_coset_evaluate(bq_polys[s].coef, self.generator, n_fri)
            bq_codewords.append(cw)
            leaves = codeword_bytes(cw)
            bqc_leaves.append(leaves)
            root = merkle.commit(leaves)
            bqc_roots.append(root)
            proof_stream.push([root])

        x_poly = Poly.from_int_coeffs(spec, [0, 1])
        points = [x_poly]
        for s in range(self.num_registers):
            points.append(Poly(Fp(spec, trace_coef.mont[:, s])))
        for s in range(self.num_registers):
            points.append(Poly(Fp(spec, trace_coef.mont[:, s])).scale(
                Fp.from_int(spec, self.omicron)))
        transition_polys = [a.evaluate_symbolic(points) for a in air]

        # transition quotients via pointwise coset division
        transition_quotients = []
        for tp in transition_polys:
            q = _ntt.fast_coset_divide(tp.coef, tz.coef, self.generator, n_fri)
            qd = (tp.capacity - 1) - (self.original_trace_length - 1)
            transition_quotients.append(Poly(Fp(spec, q.mont[..., : qd + 1])))

        md = self.max_degree(air)
        rand_coeffs = [rng.randrange(p) for _ in range(md + 1)]
        randomizer_poly = Poly.from_int_coeffs(spec, rand_coeffs)
        rand_cw = _ntt.fast_coset_evaluate(
            randomizer_poly.coef, self.generator, n_fri)
        rand_leaves = codeword_bytes(rand_cw)
        rdc_root = merkle.commit(rand_leaves)
        proof_stream.push([rdc_root])

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

        combined_codeword = _ntt.fast_coset_evaluate(
            combination.coef, self.generator, n_fri)

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
        tzc_points, tzc_paths = [], []
        ztree = merkle.MerkleTree(tz_leaves)
        for i in duplicated:
            tzc_points.append(tz_leaves[i])
            tzc_paths.append(ztree.open(i))

        return FastStarkProof(
            fri_proof=fri_proof, bqc_roots=bqc_roots, bqc_points=bqc_points,
            bqc_paths=bqc_paths, rdc_root=rdc_root, rdc_points=rdc_points,
            rdc_paths=rdc_paths, tzc_points=tzc_points, tzc_paths=tzc_paths)

    # -- verify (parity: fast_stark.rs:398-570) ------------------------------
    def verify(self, proof: FastStarkProof, air: list[MPoly],
               tz_root: bytes, boundary) -> bool:
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
        if not check_openings(proof.tzc_points, proof.tzc_paths, nd, leaf_w):
            return False

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

        # verified transition-zerofier openings (fast_stark.rs:480-498)
        tz_leafs = {}
        for ctr, i in enumerate(duplicated):
            tz_leafs[i] = proof.tzc_points[ctr]
            if not merkle.verify(tz_root, i, proof.tzc_paths[ctr], tz_leafs[i]):
                return False

        interpolants = self.boundary_interpolants(boundary)
        zerofiers = self.boundary_zerofiers(boundary)
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
            tz_val = _int_from_le(tz_leafs[current_index])
            if tz_val % p == 0:
                return False  # forged zerofier opening; reject, don't raise
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


def initialize_fast_stark_m128(expansion_factor: int,
                               num_colinearity_checks: int,
                               security_level: int, num_registers: int,
                               num_cycles: int,
                               transition_constraints_degree: int
                               ) -> FastStark:
    """Parity: fast_stark.rs:573-616."""
    spec = FieldSpec.make(M128)
    generator = 85408008396924667383611388730472331217
    num_randomizers = 4 * num_colinearity_checks
    randomized_trace_length = num_cycles + num_randomizers
    omicron_domain_length = 1 << (
        randomized_trace_length * transition_constraints_degree).bit_length()
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
    return FastStark(
        expansion_factor=expansion_factor,
        num_colinearity_checks=num_colinearity_checks,
        security_level=security_level, num_randomizers=num_randomizers,
        num_registers=num_registers, original_trace_length=num_cycles,
        generator=generator, omega=omega, omicron=omicron,
        omicron_domain=omicron_domain, fri=fri, spec=spec)
