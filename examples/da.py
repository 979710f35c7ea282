"""DAS benchmark CLI: python examples/da.py [eigenda | celestia | avail]

Capability parity with myzkp/examples/da.rs:10-104: argv selects the system,
loops data sizes {16, 64, 256, 1024}, runs setup/encode/commit/verify and
prints the SystemMetrics after each size.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myzkp_tpu.das.avail import Avail
from myzkp_tpu.das.celestia import Celestia
from myzkp_tpu.das.eigenda import EigenDA
from myzkp_tpu.das.utils import SamplePosition, get_metrics, reset_metrics


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("eigenda", "celestia", "avail"):
        print(f"Usage: {sys.argv[0]} [eigenda | celestia | avail]",
              file=sys.stderr)
        raise SystemExit(1)
    target = sys.argv[1]

    data_sizes = [16, 64, 256, 1024]
    sqrt_data_sizes = [4, 8, 16, 32]

    for data_size, sqrt_size in zip(data_sizes, sqrt_data_sizes):
        data = bytes(i % 256 for i in range(data_size))

        if target == "eigenda":
            print("# EigenDA")
            num_operators = 8
            num_verification = 5
            expansion_factor = 4.0
            chunk_size = int(data_size * expansion_factor / num_operators)
            params = EigenDA.setup(chunk_size, expansion_factor, data_size)
            encoded = EigenDA.encode(data, params)
            commit = EigenDA.commit(encoded, params)
            for i in range(num_verification):
                assert EigenDA.verify(SamplePosition(0, i, False), encoded,
                                      commit, params)
        elif target == "celestia":
            print("# Celestia")
            expansion_factor = 2
            base_num_sampling = 16
            params = Celestia.setup(sqrt_size, float(expansion_factor),
                                    data_size)
            encoded = Celestia.encode(data, params)
            commit = Celestia.commit(encoded, params)
            side = sqrt_size * expansion_factor
            for i in range(min(side * side, base_num_sampling)):
                pos = SamplePosition(i // side, i % side, False)
                assert Celestia.verify(pos, encoded, commit, params)
        else:
            print("# Avail")
            expansion_factor = 2
            chunk_size = 8
            base_num_sampling = 8
            params = Avail.setup(chunk_size, float(expansion_factor),
                                 data_size)
            encoded = Avail.encode(data, params)
            commit = Avail.commit(encoded, params)
            for i in range(min(chunk_size * expansion_factor,
                               base_num_sampling)):
                assert Avail.verify(SamplePosition(0, i, False), encoded,
                                    commit, params)

        print(get_metrics())
        reset_metrics()


if __name__ == "__main__":
    main()
