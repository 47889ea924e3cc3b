"""On-device codebook construction (ops/device_codebook.py) vs the host
two-queue builder.

The device builder is boundary package-merge: its lengths must be exactly
optimal (same total payload bits as the host builder — any optimal code
agrees on the total) and Kraft-tight; its canonical tables must match
Codebook.from_lengths bit for bit on the same length table."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from huffman_tpu.codebook import Codebook, code_lengths_from_frequencies
from huffman_tpu.constants import MAX_SYMBOLS
from huffman_tpu.ops.device_codebook import (
    device_canonical_tables,
    device_code_lengths,
)


def _freq_case(name: str) -> np.ndarray:
    rng = np.random.default_rng(hash(name) % 2**32)
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    if name == "empty":
        return freqs
    if name == "single":
        freqs[42] = 1000
    elif name == "two":
        freqs[[1, 9]] = [3, 5]
    elif name == "zipf-small":
        idx = rng.choice(MAX_SYMBOLS, size=40, replace=False)
        freqs[idx] = np.clip(rng.zipf(1.3, size=40), 1, 1 << 20)
    elif name == "zipf-large":
        idx = rng.choice(MAX_SYMBOLS, size=4000, replace=False)
        freqs[idx] = np.clip(rng.zipf(1.2, size=4000), 1, 1 << 20)
    elif name == "full-alphabet":
        freqs[:] = rng.integers(1, 1000, size=MAX_SYMBOLS)
    elif name == "romeo":
        from huffman_tpu.container.reference_format import (
            bytes_to_symbols,
            histogram_host,
        )

        data = open("/root/reference/romeo.txt", "rb").read()
        freqs = histogram_host(bytes_to_symbols(data)[0])
    return freqs


@pytest.mark.parametrize(
    "name",
    ["empty", "single", "two", "zipf-small", "zipf-large", "full-alphabet", "romeo"],
)
def test_device_lengths_optimal_and_tables_match(name):
    freqs = _freq_case(name)
    host_len = code_lengths_from_frequencies(freqs)
    dev_len = np.asarray(device_code_lengths(freqs.astype(np.int32)))

    # Optimality: identical total payload bits (any optimal code agrees).
    host_bits = int((freqs * host_len.astype(np.int64)).sum())
    dev_bits = int((freqs * dev_len.astype(np.int64)).sum())
    assert dev_bits == host_bits

    n = int((freqs > 0).sum())
    if n > 1:
        kraft = float((2.0 ** -dev_len[dev_len > 0].astype(np.float64)).sum())
        assert abs(kraft - 1.0) < 1e-9
    elif n == 1:
        assert dev_len[freqs > 0][0] == 1  # degenerate 1-bit code
    assert (dev_len[freqs == 0] == 0).all()

    # Canonical tables on the device lengths == host Codebook on them.
    cb = Codebook.from_lengths(dev_len.astype(np.uint8))
    enc_codes, enc_lens, lj, base, sym_rank = (
        np.asarray(x) for x in device_canonical_tables(jnp.asarray(dev_len))
    )
    assert np.array_equal(enc_codes, cb.codes)
    assert np.array_equal(enc_lens, cb.lengths.astype(np.int32))
    assert np.array_equal(lj, cb.lj_limit)
    assert np.array_equal(base, (cb.base & 0xFFFFFFFF).astype(np.uint32))
    if n:
        sym_order = np.zeros(cb.n_unique, dtype=np.int64)
        sym_order[sym_rank[dev_len > 0]] = np.flatnonzero(dev_len > 0)
        assert np.array_equal(sym_order, cb.sym_order.astype(np.int64))


def test_length_limit_enforced():
    """Fibonacci-skewed frequencies would build a deep tree; the device
    builder must cap at the requested limit with an optimal limited code.
    (The reference would silently wrap lengths > 255, SURVEY.md §4.)"""
    fib = [1, 1]
    while len(fib) < 40:
        fib.append(fib[-1] + fib[-2])
    freqs = np.zeros(MAX_SYMBOLS, dtype=np.int64)
    freqs[: len(fib)] = fib
    for limit in (8, 12):
        dev_len = np.asarray(
            device_code_lengths(freqs.astype(np.int32), max_len=limit)
        )
        assert dev_len.max() <= limit
        kraft = float((2.0 ** -dev_len[dev_len > 0].astype(np.float64)).sum())
        assert abs(kraft - 1.0) < 1e-9  # still a tight prefix code


def test_roundtrip_through_device_codebook():
    """Encode with the device-built codebook, decode with the host twin."""
    rng = np.random.default_rng(9)
    symbols = rng.choice(
        np.arange(500, dtype=np.uint16), size=20000,
        p=(lambda p: p / p.sum())(1.0 / np.arange(1, 501) ** 1.1),
    ).astype(np.uint16)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS)
    dev_len = np.asarray(device_code_lengths(freqs.astype(np.int32)))
    cb = Codebook.from_lengths(dev_len.astype(np.uint8))
    from huffman_tpu.bitio import pack_codes

    codes, lens = cb.encode_symbols_host(symbols)
    words, nbits = pack_codes(codes, lens)
    out = cb.decode_stream_host(words, 0, symbols.size)
    assert np.array_equal(out, symbols)


def test_lengths_cap_invariant():
    """Package-merge lengths are IDENTICAL for any alphabet_cap >=
    n_unique (the sentinel-padded list tails saturate and never enter the
    level counts). Two load-bearing consumers: the fused encoder's
    lax.switch tier ladder (ops/fused.py) and the container's host/device
    codebook single-sourcing (container/block_format._host_codebook) both
    assume any rung >= n_unique yields the same codebook."""
    rng = np.random.default_rng(17)
    for nal, expo in ((3, 1.0), (700, 1.1), (2500, 0.65)):
        a = rng.choice(65536, nal, replace=False)
        p = 1.0 / np.arange(1, nal + 1) ** expo
        p /= p.sum()
        syms = rng.choice(a, 100000, p=p)
        freqs = np.bincount(syms, minlength=MAX_SYMBOLS).astype(np.int32)
        ref = np.asarray(
            device_code_lengths(freqs, max_len=18, alphabet_cap=None)
        )
        for cap in (4096, 16384):
            got = np.asarray(
                device_code_lengths(freqs, max_len=18, alphabet_cap=cap)
            )
            assert np.array_equal(got, ref), (nal, cap)


def test_numpy_twin_matches_device():
    """codebook.package_merge_lengths (pure NumPy, the host container
    builder) must be BIT-IDENTICAL per symbol to device_code_lengths —
    host- and device-built containers share one codebook construction."""
    from huffman_tpu.codebook import package_merge_lengths

    rng = np.random.default_rng(23)
    cases = []
    for nal, expo in ((2, 1.0), (40, 1.4), (300, 1.1), (2500, 0.7),
                      (6000, 0.5)):
        a = rng.choice(MAX_SYMBOLS, nal, replace=False)
        p = 1.0 / np.arange(1, nal + 1) ** expo
        p /= p.sum()
        syms = rng.choice(a, 80000, p=p)
        cases.append(np.bincount(syms, minlength=MAX_SYMBOLS))
    # heavy weight ties: uniform counts force the leaf/package tie rule
    a = rng.choice(MAX_SYMBOLS, 1000, replace=False)
    ties = np.zeros(MAX_SYMBOLS, np.int64)
    ties[a] = 7
    cases.append(ties)
    one = np.zeros(MAX_SYMBOLS, np.int64)
    one[12345] = 99
    cases.append(one)
    for max_len in (12, 18):
        for i, freqs in enumerate(cases):
            if int((freqs > 0).sum()) > (1 << max_len):
                # Infeasible limit: the host raises (no prefix code
                # exists); the device builder can't data-check this —
                # the container gates it before dispatch.
                import pytest

                with pytest.raises(ValueError, match="cannot encode"):
                    package_merge_lengths(freqs, max_len)
                continue
            host = package_merge_lengths(freqs, max_len)
            dev = np.asarray(
                device_code_lengths(freqs.astype(np.int32), max_len=max_len)
            ).astype(np.uint8)
            assert np.array_equal(host, dev), (max_len, i)


@pytest.mark.parametrize(
    "K,nal,max_len",
    # Small cases: the interpreter pays per unrolled network op (~25 s per
    # case); real widths are chip territory (scripts/exp_pm.py).
    [(256, 100, 8), (256, 40, 12), (256, 1, 8), (512, 300, 10)],
)
def test_pallas_package_merge_kernel_matches_xla(K, nal, max_len):
    """The single-kernel Pallas package-merge (r4: the whole round loop +
    counting pass in one Mosaic program — the XLA formulation measured
    dispatch-bound, ~1.5 ms per 2K merge REGARDLESS of K) must be
    bit-identical to the XLA twin, including duplicate weights, sentinel
    tails, and the deep-tree/fibonacci profile. Interpret mode here; the
    chip re-proof is scripts/exp_pm.py + chip_check."""
    from huffman_tpu.ops.device_codebook import device_code_lengths

    rng = np.random.default_rng(K + nal + max_len)
    # A 4096-wide dense histogram: both paths take generic (n_sym,)
    # inputs, and the interpreter pays per element per network pass — the
    # full 65,536 alphabet is chip territory (scripts/exp_pm.py).
    n_sym = 4096
    freqs = np.zeros(n_sym, np.int64)
    idx = rng.choice(4096, nal, replace=False)
    if nal >= 30:  # fibonacci head forces deep optimal trees
        fib = [1, 1]
        while len(fib) < 30:
            fib.append(fib[-1] + fib[-2])
        freqs[idx[:30]] = fib
        freqs[idx[30:]] = np.clip(rng.zipf(1.3, max(nal - 30, 0)), 1, 1 << 20)
    else:
        freqs[idx] = np.clip(rng.zipf(1.3, nal), 1, 1 << 20)
    want = np.asarray(device_code_lengths(
        jnp.asarray(freqs.astype(np.int32)), max_len=max_len, alphabet_cap=K
    ))
    # use_kernel inside jit routes through _pm_pallas; on CPU the Mosaic
    # kernel only runs interpreted, so drive the private entry.
    from huffman_tpu.ops import device_codebook as dc

    present = freqs > 0
    leaf_w = np.where(present, freqs, dc._INF)
    order = np.lexsort((np.arange(n_sym), leaf_w))[:K]
    n = int(present.sum())
    got_rank, got_sym = (np.asarray(a) for a in dc._pm_pallas(
        jnp.asarray(freqs.astype(np.int32)), jnp.int32(n), max_len, K,
        interpret=True,
    ))
    # The in-kernel (weight, symbol) bitonic sort must reproduce the
    # stable two-key order exactly — the symbol scatter rides on it.
    assert np.array_equal(got_sym, order)
    want_rank = want[order]
    if n == 1:
        # the degenerate 1-bit fix is applied OUTSIDE the kernel
        want_rank = want_rank.copy()
        want_rank[0] = got_rank[0]
    assert np.array_equal(got_rank[:n], want_rank[:n])
