"""STARK / FastStark end-to-end on the Rescue-Prime AIR.

Mirrors myzkp/src/modules/zkstark/stark.rs:518-570 and
fast_stark.rs:634-692 (accept + false-boundary reject).
"""

import random

import pytest

from myzkp_tpu.stark.fast_stark import initialize_fast_stark_m128
from myzkp_tpu.stark.rescueprime import RescuePrime
from myzkp_tpu.stark.stark import initialize_stark_m128


@pytest.fixture(scope="module")
def rp_setup():
    rp = RescuePrime()
    input_element = 123456789
    output_element = rp.hash(input_element)
    return rp, input_element, output_element


@pytest.mark.slow
def test_fast_stark_accept_and_reject(rp_setup):
    rp, inp, out = rp_setup
    stark = initialize_fast_stark_m128(4, 2, 2, rp.m, rp.n + 1, 2)
    pre = stark.preprocess()
    trace = rp.trace(inp)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(out)
    proof = stark.prove(trace, boundary, air, preprocessed=pre,
                        rng=random.Random(1))
    assert stark.verify(proof, air, pre[2], boundary)
    false_boundary = rp.boundary_constraints(out + 1)
    false_proof = stark.prove(rp.trace(inp), false_boundary, air,
                              preprocessed=pre, rng=random.Random(2))
    assert not stark.verify(false_proof, air, pre[2], false_boundary)


def test_slow_stark_accept(rp_setup):
    rp, inp, out = rp_setup
    stark = initialize_stark_m128(4, 2, 2, rp.m, rp.n + 1, 2)
    air = rp.transition_constraints(stark.omicron)
    boundary = rp.boundary_constraints(out)
    proof = stark.prove(rp.trace(inp), boundary, air, rng=random.Random(3))
    assert stark.verify(proof, air, boundary)


def test_fast_stark_tiny_air_accept_and_reject():
    """FastStark end-to-end on a shrunken squaring AIR (x_{i+1} = x_i^2,
    one register, 8 cycles): covers the full preprocess/prove/verify path
    in the fast suite while the Rescue-Prime-sized run stays slow-marked
    (VERDICT r3 #7 — it dominated a cold CI run)."""
    from myzkp_tpu.ops.mpoly import MPoly
    from myzkp_tpu.stark.fast_stark import M128

    cycles = 8
    stark = initialize_fast_stark_m128(4, 2, 2, 1, cycles, 2)
    x0 = 123456789
    trace = [[pow(x0, 1 << i, M128)] for i in range(cycles)]
    variables = MPoly.variables(stark.spec, 3)  # (cycle, prev0, next0)
    air = [variables[1] ** 2 - variables[2]]
    boundary = [(0, 0, x0), (cycles - 1, 0, trace[-1][0])]
    pre = stark.preprocess()
    proof = stark.prove(trace, boundary, air, preprocessed=pre,
                        rng=random.Random(7))
    assert stark.verify(proof, air, pre[2], boundary)
    false_boundary = [(0, 0, x0), (cycles - 1, 0, (trace[-1][0] + 1) % M128)]
    false_proof = stark.prove(trace, false_boundary, air, preprocessed=pre,
                              rng=random.Random(8))
    assert not stark.verify(false_proof, air, pre[2], false_boundary)
