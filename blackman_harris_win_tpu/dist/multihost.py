"""Multi-host initialization and mesh layout.

The reference has no distributed anything (single FPGA); this is the
TPU-native communication backend design (SURVEY.md §5): ``jax.distributed``
brings up the process group, the mesh lays 'blocks' (sequence) along ICI
within a host and 'channels' across hosts on DCN — window *generation*
needs no communication at all, the analyzer's halos ride ICI, and only the
Welch psum crosses hosts.

On a pod slice, run per host::

    from blackman_harris_win_tpu.dist import multihost
    multihost.initialize()            # env-driven (TPU pods auto-detect)
    mesh = multihost.pod_mesh(blocks_per_host=..., channels=...)

This module is validated here via its single-process degenerate path and
the virtual-device mesh (the real multi-host bring-up needs pod hardware);
the sharded steps themselves are hardware-agnostic shard_maps tested on the
8-device virtual mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(**kwargs) -> None:
    """Bring up jax.distributed (idempotent).  On Cloud TPU pods all
    arguments auto-detect; explicit coordinator_address/num_processes/
    process_id can be passed for other fabrics (the simulated 2-process CPU
    bring-up in tests/test_multiprocess.py uses exactly that).

    A failed *explicit* multi-process bring-up raises — silently degrading
    to single-process would run every collective on a fraction of the data.
    Only the auto-detect path may fall back (single host, no coordinator).

    The idempotency check is ``jax.distributed.is_initialized()``, NOT
    ``jax.process_count()``: the latter initializes the XLA backend, after
    which ``jax.distributed.initialize`` refuses to run at all."""
    if jax.distributed.is_initialized() or getattr(initialize, "_done", False):
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        if int(kwargs.get("num_processes") or 1) > 1:
            raise
        # single-process (already initialized or no coordinator): fine
        pass
    initialize._done = True


def pod_mesh(channels: int = 1, blocks: int | None = None) -> Mesh:
    """(channels, blocks) mesh over all global devices, laid out so the
    'blocks' axis stays within hosts (ICI halos) and 'channels' spans hosts
    (DCN, no halo traffic).

    Device order from jax.devices() groups by process; reshaping
    (channels, blocks) with channels as the slow axis therefore puts
    consecutive block shards on intra-host neighbors.
    """
    devs = jax.devices()
    total = len(devs)
    if blocks is None:
        if total % channels:
            raise ValueError(f"{total} devices not divisible by {channels}")
        blocks = total // channels
    if channels * blocks != total:
        raise ValueError(
            f"mesh {channels}x{blocks} != {total} global devices"
        )
    arr = np.asarray(devs).reshape(channels, blocks)
    return Mesh(arr, axis_names=("channels", "blocks"))


def owned_block_cols(process_grid: np.ndarray, pid: int) -> tuple[int, int]:
    """[first, last+1) block columns owned by process ``pid`` given the
    (channels, blocks) grid of device process indices.  A host owning
    devices only on non-zero channel rows still feeds the block columns
    those devices sit at.  Pure function (testable without pod hardware);
    returns (0, 0) when the process owns no device in the mesh."""
    cols = sorted(
        {int(j) for _i, j in zip(*np.where(process_grid == pid))}
    )
    if not cols:
        return (0, 0)
    return (cols[0], cols[-1] + 1)


def process_block_range(n_total: int, mesh: Mesh) -> tuple[int, int]:
    """The [start, end) sample range this host's shards own along 'blocks' —
    for feeding per-host input pipelines without a global gather."""
    nblocks = mesh.shape["blocks"]
    per = n_total // nblocks
    grid = np.vectorize(lambda d: d.process_index)(
        mesh.devices.reshape(-1, nblocks)
    )
    lo, hi = owned_block_cols(grid, jax.process_index())
    return (lo * per, hi * per)
