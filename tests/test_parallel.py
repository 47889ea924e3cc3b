"""Distribution layer tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from huffman_tpu.codebook import Codebook
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops.tables import device_tables
from huffman_tpu.parallel import pipeline as pp


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")
    return pp.data_mesh()


def _data(seed=0, nblocks=16, B=128):
    rng = np.random.default_rng(seed)
    alphabet = rng.choice(MAX_SYMBOLS, size=100, replace=False)
    n_pairs = nblocks * B - 13
    symbols = rng.choice(alphabet, size=n_pairs).astype(np.int32)
    padded = np.zeros(nblocks * B, dtype=np.int32)
    padded[:n_pairs] = symbols
    valid = np.arange(nblocks * B) < n_pairs
    return symbols, padded.reshape(nblocks, B), valid.reshape(nblocks, B), n_pairs


def test_distributed_histogram_matches_host(mesh):
    symbols, padded, valid, n_pairs = _data()
    hist = pp.distributed_histogram(mesh, jnp.asarray(symbols))
    np.testing.assert_array_equal(
        np.asarray(hist), np.bincount(symbols, minlength=MAX_SYMBOLS)
    )


def test_full_distributed_step_roundtrips(mesh):
    symbols, padded, valid, n_pairs = _data(1)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    cb = Codebook.from_frequencies(freqs)
    t = device_tables(cb)
    B = padded.shape[1]
    W = B  # worst case

    step = pp.compress_decompress_step(mesh)
    hist, slab, bits, ok = jax.jit(
        step, static_argnames=("W", "B")
    )(
        jnp.asarray(padded),
        jnp.asarray(valid),
        t.enc_codes,
        t.enc_lens,
        t.lj_limit,
        t.base,
        t.sym_order,
        jnp.asarray(t.max_len, jnp.int32),
        W=W,
        B=B,
    )
    assert int(ok) == 1
    np.testing.assert_array_equal(np.asarray(hist)[:MAX_SYMBOLS], freqs)
    assert bits.shape == (padded.shape[0],)
    assert int(np.asarray(bits).sum()) == cb.expected_bits(freqs)


def test_distributed_encode_decode(mesh):
    symbols, padded, valid, n_pairs = _data(2)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)
    B = padded.shape[1]
    slab, bits = pp.distributed_encode(
        mesh, jnp.asarray(padded), jnp.asarray(valid), t.enc_codes, t.enc_lens, B
    )
    out = pp.distributed_decode(
        mesh, slab, t.lj_limit, t.base, t.sym_order,
        jnp.asarray(t.max_len, jnp.int32), B,
    )
    got = np.asarray(out).reshape(-1)[:n_pairs]
    np.testing.assert_array_equal(got, symbols)


def test_distributed_pallas_decode_groups():
    """The flagship group decoder sharded over the 8-device mesh: per-device
    shards must reproduce the single-device decode bit for bit."""
    import numpy as np
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.parallel import pipeline as pp

    rng = np.random.default_rng(21)
    B = 16
    ngroups = 8
    n_real = ngroups * pd.GROUP_LANES - 37
    n_lanes = ngroups * pd.GROUP_LANES
    n_pairs = n_real * B - 5
    alpha = rng.choice(MAX_SYMBOLS, 120, replace=False)
    symbols = rng.choice(alpha, n_pairs).astype(np.uint16)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
    streams = il.build_streams(slab, eff, n_real)
    stacked, _ = il.pad_streams(streams)
    rows_per = stacked.shape[0] // ngroups
    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))

    args = (
        jnp.asarray(stacked), jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab), jnp.asarray(meta),
    )
    kw = dict(
        n_steps=B, stream_rows=rows_per, sym_rows=sym_rows,
        max_len=max(cb.max_len, 1), translate=translate, min_len=min_len,
        interpret=True, multi=1,
    )
    single = np.asarray(pd.decode_groups(*args, **kw))
    mesh = pp.data_mesh()
    shard = np.asarray(pp.distributed_decode_groups(mesh, *args, **kw))
    np.testing.assert_array_equal(single, shard)


def test_distributed_wide_rank_decode_groups():
    """The SHIPPING wide-decode config over the mesh (VERDICT r4 weak #5):
    rank mode (alphabet past GATHER_MAX_ALPHABET) at the shipping
    multi=4 with packed_out + the pair-translate pass, sharded — must
    decode the corpus bit-exact."""
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd

    rng = np.random.default_rng(22)
    B = 8
    ngroups = 8
    n_real = ngroups * pd.GROUP_LANES - 11
    n_lanes = ngroups * pd.GROUP_LANES
    n_pairs = n_real * B - 3
    alpha = rng.choice(MAX_SYMBOLS, 6000, replace=False)
    symbols = rng.choice(alpha, n_pairs).astype(np.uint16)
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
    streams = il.build_streams(slab, eff, n_real)
    stacked, _ = il.pad_streams(streams)
    rows_per = stacked.shape[0] // ngroups
    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    assert not translate  # 6000 > GATHER_MAX_ALPHABET: the rank tier
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(pd.GROUP_LANES, n_real - g * pd.GROUP_LANES))

    mesh = pp.data_mesh()
    out = pp.distributed_decode_groups(
        mesh,
        jnp.asarray(stacked), jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab), jnp.asarray(meta),
        n_steps=B, stream_rows=rows_per, sym_rows=sym_rows,
        max_len=max(cb.max_len, 1), translate=False, min_len=min_len,
        interpret=True, multi=pd.DEFAULT_MULTI_RANK,
        sym_order_dev=jnp.asarray(cb.sym_order.astype(np.int32)),
        packed_out=True,
    )
    dec = (
        np.asarray(out)
        .reshape(-1, B // 2, 8, 128)[:ngroups]
        .transpose(0, 2, 3, 1)
        .astype(np.uint32, order="C")
        .view("<u2")
        .reshape(-1)[:n_pairs]
    )
    np.testing.assert_array_equal(dec, symbols)


def test_distributed_encode_streams_matches_host():
    """The flagship fused encode sharded over the 8-device mesh: group
    shards must reproduce the host interleave bit for bit, with the psum
    histogram driving one replicated codebook."""
    import numpy as np
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.parallel import pipeline as pp

    rng = np.random.default_rng(31)
    B = 16
    ngroups = 8  # one group per device
    n_lanes = ngroups * pd.GROUP_LANES
    n_pairs = n_lanes * B - 77
    alpha = rng.choice(MAX_SYMBOLS, 200, replace=False)
    symbols = rng.choice(alpha, n_pairs).astype(np.uint16)
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols

    mesh = pp.data_mesh()
    streams, counts, lengths, ok = pp.distributed_encode_streams(
        mesh, jnp.asarray(padded), jnp.asarray(n_pairs, jnp.int32),
        B, words_cap=B * pd.GROUP_LANES, max_len=18, interpret=True,
    )
    assert bool(ok)
    cb = Codebook.from_lengths(np.asarray(lengths).astype(np.uint8))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
    ref = il.build_interleaved_streams(slab, eff, (n_pairs + B - 1) // B)
    streams, counts = np.asarray(streams), np.asarray(counts)
    for g, rs in enumerate(ref):
        assert counts[g] == rs.size, g
        np.testing.assert_array_equal(streams[g, : rs.size], rs, err_msg=str(g))


def test_distributed_encode_streams_deep_codes():
    """max_len > 26 must take the two-table gather (the packed len<<26
    table overflows for deep codes)."""
    import numpy as np
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.parallel import pipeline as pp

    rng = np.random.default_rng(41)
    B = 16
    n_lanes = 8 * pd.GROUP_LANES
    n_pairs = n_lanes * B - 3
    # Fibonacci-skewed weights: natural depth > 26 for a ~45-symbol alphabet
    n = 45
    alpha = rng.choice(MAX_SYMBOLS, n, replace=False)
    w = np.array([1.55 ** -i for i in range(n)]); w /= w.sum()
    symbols = rng.choice(alpha, n_pairs, p=w).astype(np.uint16)
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols

    mesh = pp.data_mesh()
    streams, counts, lengths, ok = pp.distributed_encode_streams(
        mesh, jnp.asarray(padded), jnp.asarray(n_pairs, jnp.int32),
        B, words_cap=B * pd.GROUP_LANES, max_len=32, alphabet_cap=None,
        interpret=True,
    )
    assert bool(ok)
    cb = Codebook.from_lengths(np.asarray(lengths).astype(np.uint8))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    eff = il.effective_lengths(
        lens, n_pairs, int(cb.lengths[cb.lengths > 0].min()), n_lanes, B
    )
    ref = il.build_interleaved_streams(slab, eff, (n_pairs + B - 1) // B)
    streams, counts = np.asarray(streams), np.asarray(counts)
    for g, rs in enumerate(ref):
        assert counts[g] == rs.size
        np.testing.assert_array_equal(streams[g, : rs.size], rs)


def test_distributed_encode_streams_wide_alphabet_exact_and_flagging():
    """VERDICT r2 weak #3: the distributed fused encode's wide-alphabet
    story. (a) With the r3 default (no cap), a >8192-unique shard set is
    EXACT — the tiered codebook/gather reaches the full 16-bit alphabet,
    so ok=True and the streams match the host interleave bit for bit.
    (b) An explicit alphabet_cap the data overflows must flag ok=False
    (data-visible, never silently-wrong bytes)."""
    import numpy as np
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    from huffman_tpu.parallel import pipeline as pp

    rng = np.random.default_rng(53)
    B = 16
    n_lanes = 8 * pd.GROUP_LANES
    n_pairs = n_lanes * B - 11
    nal = 12000  # > the 8192 cap rounds 1-2 flagged on
    alpha = rng.choice(MAX_SYMBOLS, nal, replace=False)
    p = 1.0 / np.arange(1, nal + 1) ** 0.7
    p /= p.sum()
    symbols = rng.choice(alpha, n_pairs, p=p).astype(np.uint16)
    padded = np.zeros(n_lanes * B, np.int32)
    padded[:n_pairs] = symbols

    mesh = pp.data_mesh()
    streams, counts, lengths, ok = pp.distributed_encode_streams(
        mesh, jnp.asarray(padded), jnp.asarray(n_pairs, jnp.int32),
        B, words_cap=B * pd.GROUP_LANES, max_len=18, interpret=True,
    )
    assert bool(ok), "r3 default must be exact at a 12k alphabet"
    assert int((np.asarray(lengths) > 0).sum()) > 8192
    cb = Codebook.from_lengths(np.asarray(lengths).astype(np.uint8))
    slab, _, lens = bf._encode_slab_numpy(symbols, cb, n_lanes, B)
    eff = il.effective_lengths(
        lens, n_pairs, int(cb.lengths[cb.lengths > 0].min()), n_lanes, B
    )
    ref = il.build_interleaved_streams(slab, eff, (n_pairs + B - 1) // B)
    streams, counts = np.asarray(streams), np.asarray(counts)
    for g, rs in enumerate(ref):
        assert counts[g] == rs.size, g
        np.testing.assert_array_equal(streams[g, : rs.size], rs, err_msg=str(g))

    # (b) the flag-past-the-cap contract survives with an explicit cap.
    _, _, _, ok_capped = pp.distributed_encode_streams(
        mesh, jnp.asarray(padded), jnp.asarray(n_pairs, jnp.int32),
        B, words_cap=B * pd.GROUP_LANES, max_len=18, interpret=True,
        alphabet_cap=1024,
    )
    assert not bool(ok_capped), "explicit cap must flag a 12k alphabet"
