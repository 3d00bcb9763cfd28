"""The multi-host SDR chain: channelizer -> decimating FIR -> FM demod.

BASELINE config 5 ("Multi-host SDR chain: BH-prototype polyphase
channelizer + decimating FIR + FM demod, N>=2 hosts").  Sharding layout:

- the wideband input stream shards over the mesh 'blocks' (time) axis;
- each time shard pulls a left halo of one prototype length via ppermute
  and channelizes its own frames (frames are causal: a frame belongs to the
  shard its last sample lives in);
- the per-channel post-processing (decimating FIR on the channel envelope,
  FM discriminator) is frame-local, so it stays on the shard — no further
  communication;
- outputs remain sharded over 'blocks' (frames) — nothing is gathered.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..dist.halo import with_left_halo
from .channelizer import design_prototype, polyphase_channelize
from .demod import fm_demod_conj


def sdr_chain(x, prototype, n_channels: int, angle_width: int = 20,
              iq_scale: float = 2.0**14):
    """Single-device reference chain: channelize then discriminate each
    channel.  x: (T,) real int/float -> (n_frames-1, n_channels) int angle
    LSBs (instantaneous frequency per channel).

    ``iq_scale`` is a fixed quantization gain (data-independent so the
    sharded chain is bitwise-deterministic); size it so channel envelopes
    stay within +-2^15.
    """
    y = polyphase_channelize(x, prototype, n_channels)  # (nf, C) complex
    i = jnp.round(y.real * iq_scale).astype(jnp.int32)
    q = jnp.round(y.imag * iq_scale).astype(jnp.int32)
    return fm_demod_conj(i.T, q.T, 16, angle_width).T  # (nf-1, C)


def make_sharded_sdr_chain(
    mesh: Mesh,
    n_channels: int,
    taps_per_branch: int,
    window: str = "bh4",
    angle_width: int = 20,
    iq_scale: float = 2.0**14,
):
    """Build the sharded chain: input (T,) sharded P('blocks'), T a multiple
    of n_channels * n_blocks; returns per-shard frame outputs concatenated
    along the frame axis, sharded P('blocks')."""
    proto = design_prototype(n_channels, taps_per_branch, window=window)
    halo = n_channels * taps_per_branch  # one prototype length

    def shard_fn(x):  # (B,)
        xh = with_left_halo(x, halo, "blocks", circular=True)
        out = sdr_chain(xh, proto, n_channels, angle_width, iq_scale)
        # frames from the halo overlap the neighbor's; keep the frames whose
        # last sample is in this shard: the trailing B//C frame diffs
        keep = x.shape[-1] // n_channels
        return out[-keep:]

    return shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P("blocks"),
        out_specs=P("blocks"),
    )
