"""Pallas decode kernel vs its NumPy twin (interpreter mode on CPU).

The kernel and the encoder-side simulation in container/interleave.py must
agree bit for bit — including garbage lanes — or streams desynchronize.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from huffman_tpu.bitio import pack_codes
from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.container import interleave as il
from huffman_tpu.ops import pallas_decode as pd


def _setup(seed, n_real, B, alphabet_size, skew=True):
    rng = np.random.default_rng(seed)
    n_lanes = (n_real + pd.GROUP_LANES - 1) // pd.GROUP_LANES * pd.GROUP_LANES
    n_pairs = n_real * B - rng.integers(0, B)
    alphabet = rng.choice(MAX_SYMBOLS, size=alphabet_size, replace=False).astype(np.uint16)
    if skew:
        p = 1.0 / np.arange(1, alphabet_size + 1) ** 1.2
        p /= p.sum()
        symbols = rng.choice(alphabet, size=n_pairs, p=p).astype(np.uint16)
    else:
        symbols = rng.choice(alphabet, size=n_pairs).astype(np.uint16)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))

    padded = np.zeros(n_lanes * B, dtype=np.uint16)
    padded[:n_pairs] = symbols
    lens_all = cb.lengths[padded].astype(np.int64)
    lens_all[n_pairs:] = 0
    codes_all = cb.codes[padded]
    rows, maxw = [], 1
    for l in range(n_real):
        w, _ = pack_codes(codes_all[l * B : (l + 1) * B], lens_all[l * B : (l + 1) * B])
        rows.append(w)
        maxw = max(maxw, w.size)
    slab = np.zeros((n_lanes, maxw), dtype=np.uint32)
    for i, r in enumerate(rows):
        slab[i, : r.size] = r

    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens_all.reshape(n_lanes, B), n_pairs, min_len, n_lanes, B)
    streams = il.build_interleaved_streams(slab, eff, n_real)
    return symbols, n_pairs, cb, streams, n_lanes


def _run_kernel(cb, streams, n_real, B, translate=True, sym_order_dev=None,
                packed_out=False):
    stacked, _ = il.pad_streams(streams)
    ngroups = len(streams)
    rows_per = stacked.shape[0] // ngroups
    symtab, sym_rows, tr_ok = pd.build_symtab(cb.sym_order)
    if translate:
        assert tr_ok, "alphabet too large for in-kernel translation"
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))
    out = pd.decode_groups(
        jnp.asarray(stacked),
        jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab),
        jnp.asarray(meta),
        B,
        rows_per,
        sym_rows,
        max_len=max(cb.max_len, 1),
        translate=translate,
        interpret=jax.devices()[0].platform == "cpu",
        sym_order_dev=sym_order_dev,
        packed_out=packed_out,
    )
    return np.asarray(out), ngroups


@pytest.mark.parametrize(
    "seed,n_real,alphabet", [(0, 700, 50), (1, 1500, 600), (2, 1024, 2)]
)
def test_kernel_matches_twin_and_input(seed, n_real, alphabet):
    B = 32
    symbols, n_pairs, cb, streams, n_lanes = _setup(seed, n_real, B, alphabet)
    out, ngroups = _run_kernel(cb, streams, n_real, B)
    dec = (
        out.reshape(ngroups, B, 8, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
    )
    np.testing.assert_array_equal(dec, symbols.astype(np.int32))
    # full equality vs the twin, garbage lanes included
    for g in range(ngroups):
        tw = il.decode_interleaved_numpy(
            streams[g], cb, B, max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))
        )
        np.testing.assert_array_equal(out.reshape(ngroups, B, -1)[g], tw)


def test_kernel_rank_mode():
    """translate=0 emits canonical ranks for host-side translation."""
    B = 16
    symbols, n_pairs, cb, streams, _ = _setup(5, 600, B, 300)
    out, ngroups = _run_kernel(cb, streams, 600, B, translate=False)
    ranks = out.reshape(ngroups, B, 8, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
    np.testing.assert_array_equal(
        cb.sym_order[ranks], symbols
    )


def test_kernel_rank_mode_device_translate():
    """sym_order_dev translates rank -> symbol inside the decode program:
    no host-side translation loop at any alphabet size (VERDICT r1 #3)."""
    B = 16
    symbols, n_pairs, cb, streams, _ = _setup(6, 600, B, 300)
    out, ngroups = _run_kernel(
        cb, streams, 600, B, translate=False,
        sym_order_dev=jnp.asarray(cb.sym_order.astype(np.int32)),
    )
    dec = out.reshape(ngroups, B, 8, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
    np.testing.assert_array_equal(dec, symbols.astype(np.int32))


def test_kernel_rank_mode_packed_translate():
    """packed_out with translate=False (r4): the kernel's packed RANK
    pairs translate in-program to packed SYMBOL pairs — both halves of
    every word look up the packed-16 table; no unpack to one-rank-per-word
    ever materializes (the container's and bench's rank-tier layout)."""
    B = 16
    symbols, n_pairs, cb, streams, _ = _setup(7, 600, B, 300)
    out, ngroups = _run_kernel(
        cb, streams, 600, B, translate=False,
        sym_order_dev=jnp.asarray(cb.sym_order.astype(np.int32)),
        packed_out=True,
    )
    dec = (
        out.reshape(ngroups, B // 2, 8, 128)
        .transpose(0, 2, 3, 1)
        .astype(np.uint32)
        .copy(order="C")
        .view("<u2")
        .reshape(-1)[:n_pairs]
    )
    np.testing.assert_array_equal(dec, symbols)


def test_packed_out_rank_mode_requires_sym_order():
    B = 16
    symbols, n_pairs, cb, streams, _ = _setup(9, 600, B, 300)
    with pytest.raises(ValueError, match="sym_order_dev"):
        _run_kernel(cb, streams, 600, B, translate=False, packed_out=True)


def test_kernel_in_kernel_tier_boundary():
    """The in-kernel packed symbol table serves alphabets up to
    GATHER_MAX_ALPHABET (1024 as of r5: above it, rank mode + the
    pipelined pair-gather pass measures faster from ~8 table rows up —
    RESULTS round-5, perflogs/r5_rank_boundary_*.log); rows are exact
    (ceil(n_pack/128)), not pow2-padded."""
    B = 32
    symbols, n_pairs, cb, streams, _ = _setup(8, 1024, B, 900, skew=False)
    assert 512 < cb.n_unique <= 1024
    symtab, sym_rows, tr = pd.build_symtab(cb.sym_order)
    assert tr and sym_rows == -(-((cb.n_unique + 1) // 2) // 128)
    out, ngroups = _run_kernel(cb, streams, 1024, B, translate=True)
    dec = out.reshape(ngroups, B, 8, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
    np.testing.assert_array_equal(dec, symbols.astype(np.int32))


def test_kernel_mid_alphabet_takes_rank_tier():
    """8K-16K alphabets now resolve to the rank tier (build_symtab
    returns translate=False past GATHER_MAX_ALPHABET) and decode
    bit-exact through the packed pair-translate pass inside one
    program."""
    B = 32
    symbols, n_pairs, cb, streams, _ = _setup(8, 1024, B, 12000, skew=False)
    assert cb.n_unique > 8192
    symtab, sym_rows, tr = pd.build_symtab(cb.sym_order)
    assert not tr
    out, ngroups = _run_kernel(
        cb, streams, 1024, B, translate=False,
        sym_order_dev=jnp.asarray(cb.sym_order.astype(np.int32)),
    )
    dec = out.reshape(ngroups, B, 8, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
    np.testing.assert_array_equal(dec, symbols.astype(np.int32))
