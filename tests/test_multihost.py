"""Multi-host layout logic + weak-scaling harness (degenerate mode).

Round-1 VERDICT items 5/6: ``process_block_range``'s fallback was dead code
(it recomputed the identical row-0 list); the logic is now a pure function
(``owned_block_cols``) testable with multi-process layouts without pod
hardware, and ``bench_scaling.py`` runs end-to-end on the virtual mesh.
"""

import pathlib
import sys

import numpy as np

from blackman_harris_win_tpu.dist.mesh import make_mesh
from blackman_harris_win_tpu.dist.multihost import (
    owned_block_cols,
    process_block_range,
)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


class TestOwnedBlockCols:
    def test_two_hosts_split_blocks(self):
        # 2 channels x 4 blocks; host 0 owns left half, host 1 right half
        grid = np.array([[0, 0, 1, 1], [0, 0, 1, 1]])
        assert owned_block_cols(grid, 0) == (0, 2)
        assert owned_block_cols(grid, 1) == (2, 4)
        assert owned_block_cols(grid, 2) == (0, 0)

    def test_host_on_nonzero_channel_row_only(self):
        # The round-1 dead-code case: host 1/2 own devices only on channel
        # row 1 — they must still feed the block columns those devices sit at.
        grid = np.array([[0, 0, 0, 0], [1, 1, 2, 2]])
        assert owned_block_cols(grid, 1) == (0, 2)
        assert owned_block_cols(grid, 2) == (2, 4)
        assert owned_block_cols(grid, 0) == (0, 4)

    def test_channels_across_hosts(self):
        # channels spans hosts (the pod_mesh layout): every host sees all
        # block columns of its channel row
        grid = np.array([[0, 0], [1, 1], [2, 2]])
        for pid in (0, 1, 2):
            assert owned_block_cols(grid, pid) == (0, 2)

    def test_degenerate_single_process_mesh(self):
        mesh = make_mesh(blocks=4, channels=2)
        assert process_block_range(4096, mesh) == (0, 4096)


class TestWeakScalingHarness:
    def test_degenerate_run(self):
        import bench_scaling

        out = bench_scaling.run(
            [1, 2], pw_per_device=12, nfft=128, hop=64,
            frames_per_device=8, reps=1,
        )
        assert out["metric"] == "weak_scaling_efficiency"
        assert set(out["devices"]) == {1, 2}
        for key in ("gen_efficiency", "welch_efficiency"):
            assert out[key][1] == 1.0
            assert out[key][2] > 0.0
        assert 0.0 < out["value"]
