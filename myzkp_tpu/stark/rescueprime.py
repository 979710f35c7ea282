"""Rescue-Prime hash over M128 + its AIR (trace / transition / boundary).

Capability parity with myzkp/src/modules/zkstark/rescueprime.rs:
  - parameter set m=2, rate=1, capacity=1, N=27, alpha=3, hard-coded
    MDS / MDS^-1 / round constants            rescueprime.rs:16-399
  - hash (S-box pow alpha, MDS, constants; inverse S-box pow alpha^-1)
                                              rescueprime.rs:401-452
  - trace (state recorded per round)          rescueprime.rs:531-591
  - AIR: round-constant polynomials interpolated over omicron
    :454-484, transition constraints MDS(prev^a)+C1 = (MDS^-1(next-C2))^a
    :486-519, boundary [(0,1,0),(N,0,output)] :521-529
  - known-answer vectors: hash(1) = 2441802659...87294  :606-619

The hash itself is 27 sequential 128-bit-exponent S-box rounds on a 2-element
state — host Python ints (microseconds); the STARK pipeline consumes the trace
on device.  ``hash_batch`` vectorizes the permutation over many inputs on
device for throughput scenarios (the alpha^-1 S-box runs as a 127-step
square-and-multiply scan).
"""

from __future__ import annotations

from ..fields import limb
from ..fields.fp import Fp
from ..fields.spec import FieldSpec
from ..ops.mpoly import MPoly
from . import rescue_constants as C


class RescuePrime:
    def __init__(self):
        self.p = C.P
        self.m = C.M
        self.rate = C.RATE
        self.capacity = C.CAPACITY
        self.n = C.N_ROUNDS
        self.alpha = C.ALPHA
        self.alpha_inv = C.ALPHA_INV
        self.mds = C.MDS
        self.mds_inv = C.MDS_INV
        self.round_constants = C.ROUND_CONSTANTS
        self.spec = FieldSpec.make(self.p)

    # -- permutation (host ints; parity: rescueprime.rs:401-452) -------------
    def _round(self, state: list[int], r: int) -> list[int]:
        p, m = self.p, self.m
        # forward half-round
        state = [pow(s, self.alpha, p) for s in state]
        state = [
            sum(self.mds[i][j] * state[j] for j in range(m)) % p for i in range(m)
        ]
        state = [
            (state[i] + self.round_constants[2 * r * m + i]) % p for i in range(m)
        ]
        # backward half-round
        state = [pow(s, self.alpha_inv, p) for s in state]
        state = [
            sum(self.mds[i][j] * state[j] for j in range(m)) % p for i in range(m)
        ]
        state = [
            (state[i] + self.round_constants[2 * r * m + m + i]) % p
            for i in range(m)
        ]
        return state

    def hash(self, input_element: int) -> int:
        state = [input_element % self.p] + [0] * (self.m - 1)
        for r in range(self.n):
            state = self._round(state, r)
        return state[0]

    def trace(self, input_element: int) -> list[list[int]]:
        """All N+1 states (parity: rescueprime.rs:531-591)."""
        state = [input_element % self.p] + [0] * (self.m - 1)
        out = [list(state)]
        for r in range(self.n):
            state = self._round(state, r)
            out.append(list(state))
        return out

    # -- batched device permutation ------------------------------------------
    def hash_batch(self, inputs: Fp) -> Fp:
        """Vectorized Rescue-Prime over a batch of inputs (device)."""
        spec = self.spec
        batch = inputs.shape
        state = [inputs] + [Fp.zeros(spec, batch) for _ in range(self.m - 1)]
        for r in range(self.n):
            state = [s ** self.alpha for s in state]
            state = self._mds_mul(state, self.mds)
            state = [
                state[i] + Fp.from_int(spec, self.round_constants[2 * r * self.m + i])
                for i in range(self.m)
            ]
            state = [s ** self.alpha_inv for s in state]
            state = self._mds_mul(state, self.mds)
            state = [
                state[i]
                + Fp.from_int(spec, self.round_constants[2 * r * self.m + self.m + i])
                for i in range(self.m)
            ]
        return state[0]

    def _mds_mul(self, state, mat):
        spec = self.spec
        out = []
        for i in range(self.m):
            acc = state[0] * Fp.from_int(spec, mat[i][0])
            for j in range(1, self.m):
                acc = acc + state[j] * Fp.from_int(spec, mat[i][j])
            out.append(acc)
        return out

    # -- AIR (parity: rescueprime.rs:454-529) --------------------------------
    def round_constants_polynomials(self, omicron: int):
        """Interpolate first/second-half constants over omicron^r, lifted to
        MPolys in variable 0 (the cycle variable)."""
        from .fri import _host_interpolate

        p = self.p
        domain = [pow(omicron, r, p) for r in range(self.n)]
        first, second = [], []
        for i in range(self.m):
            vals = [self.round_constants[2 * r * self.m + i] for r in range(self.n)]
            coeffs = _host_interpolate(domain, vals, p)
            first.append(MPoly.lift(coeffs, self.spec, 0))
        for i in range(self.m):
            vals = [
                self.round_constants[2 * r * self.m + self.m + i]
                for r in range(self.n)
            ]
            coeffs = _host_interpolate(domain, vals, p)
            second.append(MPoly.lift(coeffs, self.spec, 0))
        return first, second

    def transition_constraints(self, omicron: int) -> list[MPoly]:
        """MDS(prev^a) + C1(x) - (MDS^-1(next - C2(x)))^a per register."""
        first, second = self.round_constants_polynomials(omicron)
        variables = MPoly.variables(self.spec, 1 + 2 * self.m)
        prev = variables[1 : 1 + self.m]
        nxt = variables[1 + self.m : 1 + 2 * self.m]

        air = []
        for i in range(self.m):
            lhs = MPoly.constant(self.spec, 0)
            for k in range(self.m):
                lhs = lhs + MPoly.constant(self.spec, self.mds[i][k]) * (
                    prev[k] ** self.alpha
                )
            lhs = lhs + first[i]
            rhs = MPoly.constant(self.spec, 0)
            for k in range(self.m):
                rhs = rhs + MPoly.constant(self.spec, self.mds_inv[i][k]) * (
                    nxt[k] - second[k]
                )
            rhs = rhs ** self.alpha
            air.append(lhs - rhs)
        return air

    def boundary_constraints(self, output_element: int) -> list[tuple]:
        """[(cycle, register, value)] (parity: rescueprime.rs:521-529)."""
        return [(0, 1, 0), (self.n, 0, output_element % self.p)]
