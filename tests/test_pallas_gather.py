"""Displacement-table gather: packing properties, native/numpy twin
identity, and the Pallas kernel (interpreter) against a plain table
lookup."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops import pallas_gather as pg


def _alphabet(rng, n, structured=False):
    if structured:
        # ASCII-pair-like: dense identical lo-sets across many hi rows (the
        # adversarial case for row displacement).
        los = rng.choice(96, size=min(n // 64 + 1, 96), replace=False) + 32
        his = np.arange(32, 32 + 64)
        syms = (his[:, None] * 256 + los[None, :]).reshape(-1)[:n]
    else:
        syms = rng.choice(MAX_SYMBOLS, size=n, replace=False)
    present = np.zeros(MAX_SYMBOLS, dtype=bool)
    present[syms] = True
    return present


@pytest.mark.parametrize(
    "seed,n,structured", [(0, 500, False), (1, 4000, False), (2, 3000, True), (3, 1, False)]
)
def test_pack_resolves_every_present_symbol(seed, n, structured):
    rng = np.random.default_rng(seed)
    present = _alphabet(rng, n, structured)
    values = rng.integers(0, 1 << 32, MAX_SYMBOLS, dtype=np.uint64).astype(np.uint32)
    r = pg.build_displacement_table(values, present)
    assert r is not None
    disp, table = r
    syms = np.flatnonzero(present)
    slots = disp[syms >> 8] + (syms & 255)
    assert (slots >= 0).all() and (slots < table.size).all()
    np.testing.assert_array_equal(table[slots], values[syms])


def test_pack_native_matches_numpy_twin():
    rng = np.random.default_rng(9)
    present = _alphabet(rng, 2500, structured=True)
    values = rng.integers(0, 1 << 32, MAX_SYMBOLS, dtype=np.uint64).astype(np.uint32)
    r = pg.build_displacement_table(values, present)
    assert r is not None
    disp, table = r
    tw = pg._pack_rows(
        values.reshape(256, 256), present.reshape(256, 256), table.size
    )
    assert tw is not None
    np.testing.assert_array_equal(disp, tw[0])
    np.testing.assert_array_equal(table, tw[1])


def test_empty_alphabet_returns_none():
    assert pg.build_displacement_table(
        np.zeros(MAX_SYMBOLS, np.uint32), np.zeros(MAX_SYMBOLS, bool)
    ) is None


def test_kernel_matches_table_lookup():
    rng = np.random.default_rng(4)
    present = _alphabet(rng, 1200, structured=False)
    values = rng.integers(0, 1 << 32, MAX_SYMBOLS, dtype=np.uint64).astype(np.uint32)
    disp, table = pg.build_displacement_table(values, present)
    syms = np.flatnonzero(present)
    data = rng.choice(syms, size=5000).astype(np.int32)
    out = pg.gather_table_pallas(
        jnp.asarray(data), jnp.asarray(disp), jnp.asarray(table), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(out), values[data])


def test_gather_u16_matches_table():
    rng = np.random.default_rng(6)
    n = 40000
    vals = rng.integers(0, 65536, n, dtype=np.int64).astype(np.uint32)
    n_pack = (n + 1) // 2
    rows = 1
    while rows * 128 < n_pack:
        rows <<= 1
    even = np.zeros(rows * 128, np.uint32); even[: (n + 1) // 2] = vals[0::2]
    odd = np.zeros(rows * 128, np.uint32); odd[: n // 2] = vals[1::2]
    packed = even | (odd << 16)
    idx = rng.integers(0, n, 5000).astype(np.int32)
    out = pg.gather_u16_pallas(jnp.asarray(idx), jnp.asarray(packed), interpret=True)
    np.testing.assert_array_equal(np.asarray(out), vals[idx].astype(np.int32))


def test_gather_u16_pairs_matches_table_all_per_cells():
    # The packed PAIR gather (the decoder's rank-tier translate pass)
    # with the r4b knobs: per_cell override and exact-ish (2-row
    # granularity) tables via pallas_decode._pack_rows_for.
    from huffman_tpu.ops.pallas_decode import _pack_rows_for

    rng = np.random.default_rng(9)
    n = 30001  # odd, >16384: the rank tier's real territory
    vals = rng.integers(0, 65536, n, dtype=np.int64).astype(np.uint32)
    rows = _pack_rows_for(n)
    assert rows == 118  # 15001 packed words -> 118 rows, not pow2's 128
    even = np.zeros(rows * 128, np.uint32); even[: (n + 1) // 2] = vals[0::2]
    odd = np.zeros(rows * 128, np.uint32); odd[: n // 2] = vals[1::2]
    packed16 = even | (odd << 16)
    lo = rng.integers(0, n, 4096).astype(np.uint32)
    hi = rng.integers(0, n, 4096).astype(np.uint32)
    packed_idx = (lo | (hi << 16)).view(np.int32)
    want = (vals[lo] | (vals[hi] << 16)).view(np.int32)
    for per_cell in (None, 4, 16):
        out = pg.gather_u16_pairs_pallas(
            jnp.asarray(packed_idx), jnp.asarray(packed16),
            interpret=True, per_cell=per_cell,
        )
        np.testing.assert_array_equal(np.asarray(out), want)


def test_gather_rank_select_all_per_cells():
    # The fused encoder's succinct-dictionary gather with the grid-cell
    # size override (swept on chip at the wide caps; exp_rank_gather.py).
    rng = np.random.default_rng(12)
    present = _alphabet(rng, 3000, structured=False)
    values = rng.integers(0, 1 << 32, MAX_SYMBOLS, dtype=np.uint64).astype(
        np.uint32
    )
    maskw, cums, dense, ok = pg.build_rank_select(values, present, cap=4096)
    assert ok
    syms = np.flatnonzero(present)
    data = rng.choice(syms, size=5000).astype(np.int32)
    for per_cell in (None, 4, 16):
        out = pg.gather_rank_select(
            jnp.asarray(data), jnp.asarray(maskw), jnp.asarray(cums),
            jnp.asarray(dense), interpret=True, per_cell=per_cell,
        )
        np.testing.assert_array_equal(np.asarray(out), values[data])


@pytest.mark.parametrize(
    "seed,n_unique,cap,max_len",
    [(0, 300, 4096, 18), (1, 3000, 4096, 18), (2, 9000, 16384, 18),
     (3, 60, 4096, 12)],
)
def test_gather_rank_canonical_matches_packed(seed, n_unique, cap, max_len):
    # The r5 two-level wide-encode scheme: canonical-rank dense table +
    # arithmetic coding must be BIT-IDENTICAL to the packed-code
    # rank-select over a real codebook (it replaces it in the fused
    # encoder's wide tiers).
    from huffman_tpu.constants import MAX_CODE_LEN
    from huffman_tpu.ops.device_codebook import (
        device_canonical_tables, device_code_lengths,
    )

    rng = np.random.default_rng(seed)
    alpha = rng.choice(MAX_SYMBOLS, n_unique, replace=False)
    p = 1.0 / np.arange(1, n_unique + 1) ** 0.8
    syms = rng.choice(alpha, 20000, p=p / p.sum()).astype(np.int32)
    hist = np.bincount(syms, minlength=MAX_SYMBOLS).astype(np.int32)
    lengths = device_code_lengths(
        jnp.asarray(hist), max_len=max_len, alphabet_cap=cap, use_kernel=False
    )
    enc_codes, enc_lens, _lj, base, sym_rank = device_canonical_tables(lengths)
    enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes

    mw, cm, dn, ok = pg.build_rank_select(enc_packed, lengths > 0, cap=cap)
    want = pg.gather_rank_select(
        jnp.asarray(syms[:4096]), mw, cm, dn, interpret=True
    )
    mw2, cm2, dn2, ok2 = pg.build_rank_select(
        sym_rank.astype(jnp.uint32), lengths > 0, cap=cap
    )
    assert bool(ok) and bool(ok2)
    canon16 = dn2[0::2] | (dn2[1::2] << 16)
    ls = jnp.arange(1, MAX_CODE_LEN + 1, dtype=jnp.int32)
    counts = jnp.sum((lengths[None, :] == ls[:, None]).astype(jnp.int32),
                     axis=1)
    start = jnp.concatenate(
        [jnp.zeros(2, jnp.int32), jnp.cumsum(counts)[: MAX_CODE_LEN - 1]]
    )
    for per_cell in (None, 4):
        got = pg.gather_rank_canonical(
            jnp.asarray(syms[:4096]), mw2, cm2, canon16, start, base,
            max_len=max_len, interpret=True, per_cell=per_cell,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # And against the host ground truth, not just the sibling kernel.
    np.testing.assert_array_equal(
        np.asarray(want), np.asarray(enc_packed)[syms[:4096]]
    )
    # Full-alphabet identity addressing: table = sym_rank itself, no
    # succinct rank stage (the fused top tier's configuration).
    sr = sym_rank.astype(jnp.uint32)
    canon16_id = sr[0::2] | (sr[1::2] << 16)
    got_id = pg.gather_rank_canonical(
        jnp.asarray(syms[:4096]), mw2, cm2, canon16_id, start, base,
        max_len=max_len, interpret=True, identity_rank=True,
    )
    np.testing.assert_array_equal(np.asarray(got_id), np.asarray(want))


def test_default_per_cell_tracks_sweep():
    # Measured mapping (perflogs/r4c_exp_rank_gather.log): big tables want
    # small cells, small tables big cells.
    assert pg.default_per_cell(16) == 128    # cap 4096 canon
    assert pg.default_per_cell(32) == 128    # cap 4096 packed
    assert pg.default_per_cell(128) == 64    # cap 16384 packed
    assert pg.default_per_cell(256) == 64    # cap 32768 packed
    assert pg.default_per_cell(512) == 32    # cap 65536 packed


def test_pack_rows_for_granularity():
    from huffman_tpu.ops.pallas_decode import _pack_rows_for

    assert _pack_rows_for(1) == 16          # floor
    assert _pack_rows_for(4096) == 16       # 2048 words -> 16 rows
    assert _pack_rows_for(30000) == 118     # exact-ish, 2-row steps
    assert _pack_rows_for(30001) == 118
    assert _pack_rows_for(65536) == 256     # full alphabet
