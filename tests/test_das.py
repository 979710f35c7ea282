"""Reed-Solomon + DAS model tests.

Mirrors myzkp/src/modules/algebra/reedsolomon.rs tests (:457-571: systematic
placement, 1-2 error correction, 3-error rejection, 2D) and the das/ module
tests (celestia.rs/avail.rs/eigenda.rs: sample verify + reconstruct).
"""

import numpy as np
import pytest

from myzkp_tpu.codes import reedsolomon as rs
from myzkp_tpu.das.avail import Avail
from myzkp_tpu.das.celestia import Celestia
from myzkp_tpu.das.eigenda import EigenDA
from myzkp_tpu.das.utils import SamplePosition, get_metrics, reset_metrics


def test_rs1d_systematic_and_correction():
    coder = rs.setup_rs1d(7, 3)
    msg = [9, 1, 7]
    code = rs.encode_rs1d(msg, coder)
    assert code[4:7] == msg  # reedsolomon.rs:478-485
    assert rs.decode_rs1d(code, coder) == msg
    c1 = list(code)
    c1[0] ^= 0x55
    assert rs.decode_rs1d(c1, coder) == msg
    c2 = list(code)
    c2[1] ^= 0x21
    c2[5] ^= 0x07
    assert rs.decode_rs1d(c2, coder) == msg
    c3 = list(code)
    c3[0] ^= 1
    c3[2] ^= 5
    c3[4] ^= 9
    assert rs.decode_rs1d(c3, coder) is None  # beyond error budget


def test_rs2d_roundtrip_with_error():
    coder = rs.setup_rs2d(4, 4, 3)
    msg = [5, 10, 99]
    code = rs.encode_rs2d(msg, coder)
    assert rs.decode_rs2d(code, coder) == msg
    bad = [list(r) for r in code]
    bad[0][0] ^= 0xAA
    assert rs.decode_rs2d(bad, coder) == msg


def test_rs_batched_encode_matches_scalar():
    coder = rs.setup_rs1d(7, 3)
    msgs = np.random.RandomState(0).randint(0, 256, size=(10, 3),
                                            dtype=np.uint8)
    batch = rs.encode_rs1d_batch(msgs, coder)
    for row_in, row_out in zip(msgs, batch):
        assert list(row_out) == rs.encode_rs1d(list(row_in), coder)


def test_celestia():
    data = bytes(range(32))
    reset_metrics()
    p = Celestia.setup(4, 2.0, 32)
    enc = Celestia.encode(data, p)
    com = Celestia.commit(enc, p)
    assert Celestia.verify(SamplePosition(1, 2, True), enc, com, p)
    assert Celestia.verify(SamplePosition(1, 2, False), enc, com, p)
    assert Celestia.reconstruct(enc, p)[:32] == data
    m = get_metrics()
    assert m.encoding_time > 0 and m.commitment_size > 0


@pytest.mark.slow
def test_avail():
    data = bytes(range(32))
    p = Avail.setup(8, 2.0, 32)
    enc = Avail.encode(data, p)
    com = Avail.commit(enc, p)
    for i in range(2):
        assert Avail.verify(SamplePosition(0, i, False), enc, com, p)
    assert Avail.reconstruct(enc, p) == data


@pytest.mark.slow
def test_eigenda():
    data = bytes(range(32))
    p = EigenDA.setup(8, 2.0, 32)
    enc = EigenDA.encode(data, p)
    com = EigenDA.commit(enc, p)
    for i in range(2):
        assert EigenDA.verify(SamplePosition(0, i, False), enc, com, p)
    assert EigenDA.reconstruct(enc, p) == data
