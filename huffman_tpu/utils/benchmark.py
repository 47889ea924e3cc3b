"""Benchmark data + helpers.

The measurement harnesses live in bench.py / scripts/ and use
utils.timing.amortized_time_fn (single-dispatch timing is meaningless
through the axon tunnel — see CLAUDE.md). This module supplies the
synthetic corpus and the result record type.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

def zipf_pairs(
    n_bytes: int,
    n_unique: int,
    rng: np.random.Generator,
    expo: float = 0.65,
) -> np.ndarray:
    """Zipf(expo) byte-pair corpus over ``n_unique`` uniformly-drawn 16-bit
    symbols — the shared wide-alphabet recipe (bench.py's wide30k metric,
    scripts/perf_tiers.py's tier sweep, chip_check's rank20k sweep case all
    use THIS function so their corpora stay statistically comparable).
    Returns uint8 bytes, little-endian pairs."""
    a = rng.choice(65536, n_unique, replace=False).astype(np.uint16)
    p = 1.0 / np.arange(1, n_unique + 1) ** expo
    p /= p.sum()
    return rng.choice(a, n_bytes // 2, p=p).astype("<u2").view(np.uint8)


def silesia_like(n_bytes: int, seed: int = 0) -> np.ndarray:
    """Synthetic corpus with text-like symbol statistics (no network access
    to the real Silesia corpus in this environment): a Zipf-distributed
    mixture over byte pairs built from English-like bigram structure plus
    near-incompressible sections, giving a realistic multi-KB codebook and
    ~0.6 compression ratio like the bundled romeo.txt.

    The noise section draws from a 1,024-pair subset (10 bits/pair entropy
    against the 16-bit raw coding — weakly compressible, like the binary
    sections of real corpora) rather than all 65,536 pairs, keeping the
    corpus alphabet around ~4,000 symbols. Since r5 that places the
    headline in the RANK tier (GATHER_MAX_ALPHABET = 1024 — the in-kernel
    symtab gather measured slower than the separate pair-translate pass
    from ~8 table rows up), so the benchmark measures the COMPLETE decode
    including the in-jit packed rank->symbol translation pass."""
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
