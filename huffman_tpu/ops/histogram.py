"""Byte-pair histogram on TPU.

Replaces the reference's atomicAdd grid-stride kernel (reference:
Compressor.cu:38-48) with two TPU-native strategies:

* ``histogram_scatter`` — XLA scatter-add (``.at[].add``). Simple; XLA
  lowers it to a sort + segmented reduction on TPU.
* ``histogram_matmul`` — the MXU formulation: split each 16-bit symbol into
  hi/lo bytes and accumulate one-hot(hi)^T @ one-hot(lo) chunk by chunk.
  The 256x256 product IS the dense 65,536-bin histogram (row-major =
  ``hi * 256 + lo`` = the symbol value). This keeps all the work on the
  systolic array with zero scatter traffic — there is no atomic on a TPU,
  and this is the idiomatic replacement.

Both are jit-compatible with static shapes and run under shard_map with a
``psum`` over the data axis for the distributed histogram (SURVEY.md §2
"Parallelism & distribution").

Counts are int32 (x64 is unavailable on device): a single bin saturates
past 2^31 pairs (~4 GiB of one repeated byte pair per device shard). The
container layer enforces a 4 GiB per-container bound; larger corpora go
through the sharded/streaming formats whose per-shard histograms stay in
range, and the host histogram (np.bincount / native) is int64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..constants import MAX_SYMBOLS


def bytes_to_symbols_device(data: jax.Array) -> jax.Array:
    """uint8 byte vector (even length) -> int32 byte-pair symbols.

    Device twin of container.reference_format.bytes_to_symbols; symbol =
    ``data[2i] | data[2i+1] << 8`` (little-endian pair).
    """
    pairs = data.reshape(-1, 2).astype(jnp.int32)
    return pairs[:, 0] | (pairs[:, 1] << 8)


def histogram_scatter(symbols: jax.Array, valid_count: jax.Array | None = None) -> jax.Array:
    """Dense histogram via scatter-add. ``valid_count`` masks tail padding
    (padded entries beyond it are dropped by routing them to an overflow
    bin)."""
    symbols = symbols.astype(jnp.int32).reshape(-1)
    if valid_count is not None:
        idx = jnp.arange(symbols.shape[0], dtype=jnp.int32)
        symbols = jnp.where(idx < valid_count, symbols, MAX_SYMBOLS)
    hist = jnp.zeros(MAX_SYMBOLS + 1, dtype=jnp.int32)
    hist = hist.at[symbols].add(1, mode="drop")
    return hist[:MAX_SYMBOLS]


@functools.partial(jax.jit, static_argnames=("chunk",))
def histogram_matmul(symbols: jax.Array, chunk: int = 1024) -> jax.Array:
    """Dense histogram as a sum of one-hot outer products on the MXU.

    For each chunk C of symbols: ``onehot(hi) (C,256)`` and
    ``onehot(lo) (C,256)``; ``hi^T @ lo`` accumulates counts[hi, lo].
    bf16 one-hots with f32 accumulation are exact (values are 0/1 and
    per-chunk counts <= chunk < 2^24).
    """
    symbols = symbols.astype(jnp.int32).reshape(-1)
    n = symbols.shape[0]
    pad = (-n) % chunk
    if pad:
        # Padding routes to symbol 0; corrected after the loop.
        symbols = jnp.concatenate([symbols, jnp.zeros(pad, jnp.int32)])
    chunks = symbols.reshape(-1, chunk)

    ids = jnp.arange(256, dtype=jnp.int32)

    def body(acc, sym_chunk):
        hi = (sym_chunk >> 8)[:, None] == ids[None, :]
        lo = (sym_chunk & 0xFF)[:, None] == ids[None, :]
        # Per-chunk counts <= chunk < 2^24: exact in f32. Accumulate in i32
        # so multi-GB inputs can't lose counts past the f32 mantissa.
        counts = jnp.dot(
            hi.astype(jnp.bfloat16).T,
            lo.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return acc + counts.astype(jnp.int32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((256, 256), jnp.int32), chunks)
    hist = acc.reshape(MAX_SYMBOLS)
    if pad:
        hist = hist.at[0].add(-pad)
    return hist


def histogram(symbols: jax.Array, method: str = "scatter") -> jax.Array:
    if method == "scatter":
        return histogram_scatter(symbols)
    if method == "matmul":
        return histogram_matmul(symbols)
    raise ValueError(f"unknown histogram method {method!r}")
