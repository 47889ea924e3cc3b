"""Device-side interleaved-stream construction (encode hot path).

The group-interleaved payload is defined by a decoder simulation
(container/interleave.py): at each step, lanes whose buffer dropped below
33 valid bits take the next stream words in lane order. The host builders
(NumPy / native C++) run that simulation literally. On device the
simulation collapses into closed-form vector ops — there is no loop at all:

* a lane's refill count after step t is ``r_t = cum_bits[l, t] >> 5``
  (buffer starts at 64 = 2 words; refill restores >= 33 live bits, so the
  number of words consumed is just total bits shifted by 5);
* the refill *indicator* at (l, t) is the diff ``r_t - r_{t-1}`` in {0,1};
* a refill's stream slot is the exclusive cumsum of indicators in
  (step-major, lane-minor) order — one transpose + cumsum per group;
* the word it carries is slab word ``r_t + 1`` (words 0,1 are preloaded) —
  a per-lane gather; the deposit is a sorted scatter.

This makes histogram -> device codebook (ops/device_codebook.py) ->
pack (ops/encode.py) -> interleave a single XLA program with one D2H copy
of the finished payload; the reference's encoder crosses the host/device
boundary 10+ times (SURVEY.md §3.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pallas_decode import GROUP_LANES, PRELOAD_WORDS


@functools.partial(jax.jit, static_argnames=("words_cap",))
def build_streams_device(
    slab: jax.Array,      # (n_lanes, W) uint32 per-lane packed words
    eff_lens: jax.Array,  # (n_lanes, B) int32 per-step consumed bits
    n_real: jax.Array,    # scalar int32: lanes beyond this never refill
    words_cap: int,       # static body-word capacity per group (<= B*1024)
):
    """Returns (streams (ngroups, 2*1024 + words_cap) uint32, counts
    (ngroups,) int32 of meaningful words incl. preload). Stream g's first
    ``counts[g]`` words equal container/interleave.build_interleaved_streams
    output for that group.

    ``words_cap`` must bound EVERY group's body words (counts[g] - 2048),
    not the average — positions past a group's cap spill into the next
    group's region. B * GROUP_LANES is always safe; callers with a host
    view of eff_lens can use ``(eff.sum per group) >> 5`` exactly. The
    returned counts let callers verify the cap after the fact."""
    n_lanes, W = slab.shape
    B = eff_lens.shape[1]
    ngroups = n_lanes // GROUP_LANES

    lane = jnp.arange(n_lanes, dtype=jnp.int32)
    real = (lane < n_real)[:, None]

    cum = jnp.cumsum(eff_lens.astype(jnp.int32), axis=1)
    r = jnp.where(real, cum >> 5, 0)  # refill count after step t
    r_prev = jnp.concatenate([jnp.zeros((n_lanes, 1), jnp.int32), r[:, :-1]], axis=1)
    ind = r - r_prev  # refill indicator in {0, 1}

    # Word carried by a refill: slab word r_t + 1 (0 beyond the packed
    # width — those are the zero-bit garbage-step words).
    widx = jnp.minimum(r + 1, W - 1)
    word = jnp.take_along_axis(slab, widx, axis=1)
    word = jnp.where((r + 1 < W) & (ind > 0), word, 0)

    # Stream slot: exclusive cumsum in (step, lane) order within the group.
    ind_g = (
        ind.reshape(ngroups, GROUP_LANES, B)
        .transpose(0, 2, 1)
        .reshape(ngroups, B * GROUP_LANES)
    )
    incl = jnp.cumsum(ind_g, axis=1)
    pos = incl - ind_g
    counts = incl[:, -1]

    word_g = (
        word.reshape(ngroups, GROUP_LANES, B)
        .transpose(0, 2, 1)
        .reshape(ngroups, B * GROUP_LANES)
    )
    goff = jnp.arange(ngroups, dtype=jnp.int32)[:, None] * words_cap
    # Non-refill slots carry value 0 (word is masked above) at their
    # exclusive-cumsum position, which is monotone — indices_are_sorted
    # requires a monotone index stream; an end-of-buffer sentinel between
    # real indices corrupts the scatter on real TPUs.
    flat_pos = pos + goff
    body = jnp.zeros(ngroups * words_cap, dtype=slab.dtype)
    body = body.at[flat_pos.reshape(-1)].add(
        word_g.reshape(-1), mode="drop", indices_are_sorted=True
    )
    body = body.reshape(ngroups, words_cap)

    pre = (
        slab[:, :PRELOAD_WORDS]
        .reshape(ngroups, GROUP_LANES, PRELOAD_WORDS)
        .transpose(0, 2, 1)
        .reshape(ngroups, PRELOAD_WORDS * GROUP_LANES)
    )
    streams = jnp.concatenate([pre, body], axis=1)
    return streams, counts + PRELOAD_WORDS * GROUP_LANES
