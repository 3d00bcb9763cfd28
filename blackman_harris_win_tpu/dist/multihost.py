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
    process_id can be passed for other fabrics."""
    if jax.process_count() > 1 or getattr(initialize, "_done", False):
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
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


def process_block_range(n_total: int, mesh: Mesh) -> tuple[int, int]:
    """The [start, end) sample range this host's shards own along 'blocks' —
    for feeding per-host input pipelines without a global gather."""
    nblocks = mesh.shape["blocks"]
    per = n_total // nblocks
    mine = [
        i
        for i, d in enumerate(mesh.devices.reshape(-1, nblocks)[0])
        if d.process_index == jax.process_index()
    ]
    if not mine:  # this host only holds other channel rows; same block cols
        col_owner = [
            (i, d.process_index)
            for i, d in enumerate(mesh.devices.reshape(-1, nblocks)[0])
        ]
        mine = [i for i, p in col_owner if p == jax.process_index()]
    if not mine:
        return (0, 0)
    return (min(mine) * per, (max(mine) + 1) * per)
