"""Device-resident codebook tables.

Bridges the host :class:`~huffman_tpu.codebook.Codebook` to the dense arrays
the encode/decode kernels gather from. All tables are 32-bit (TPU lanes are
32-bit); ``base`` is wrapped mod 2^32, which keeps rank arithmetic exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..codebook import Codebook
from ..constants import MAX_CODE_LEN, MAX_SYMBOLS


class DeviceTables(NamedTuple):
    enc_codes: jnp.ndarray  # (MAX_SYMBOLS,) uint32 right-justified codeword
    enc_lens: jnp.ndarray   # (MAX_SYMBOLS,) int32 codeword length (0 absent)
    lj_limit: jnp.ndarray   # (MAX_CODE_LEN,) uint32 canonical boundaries
    base: jnp.ndarray       # (MAX_CODE_LEN + 1,) uint32, wrapped mod 2^32
    sym_order: jnp.ndarray  # (n_unique_padded,) int32 canonical symbol order
    max_len: int            # static python int
    enc_packed: jnp.ndarray | None  # (MAX_SYMBOLS,) uint32 len<<26|code,
                                    # None when max_len > 26


def device_tables(cb: Codebook, pad_sym_order_to: int | None = None) -> DeviceTables:
    n = cb.n_unique
    if pad_sym_order_to is not None:
        pad = pad_sym_order_to
    else:
        # Pad to a power of two (>= 1024) so kernels specialize on only a
        # handful of sym_order shapes across codebooks.
        pad = 1024
        while pad < n:
            pad <<= 1
    if pad < n:
        raise ValueError("pad_sym_order_to smaller than the codebook")
    sym_order = np.zeros(pad, dtype=np.int32)
    sym_order[:n] = cb.sym_order
    packed = None
    if cb.max_len <= 26:
        packed = jnp.asarray(
            (cb.lengths.astype(np.uint32) << 26) | cb.codes.astype(np.uint32)
        )
    return DeviceTables(
        enc_packed=packed,
        enc_codes=jnp.asarray(cb.codes, dtype=jnp.uint32),
        enc_lens=jnp.asarray(cb.lengths.astype(np.int32)),
        lj_limit=jnp.asarray(cb.lj_limit, dtype=jnp.uint32),
        base=jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        sym_order=jnp.asarray(sym_order),
        max_len=max(cb.max_len, 1),
    )


__all__ = ["DeviceTables", "device_tables", "MAX_SYMBOLS", "MAX_CODE_LEN"]
