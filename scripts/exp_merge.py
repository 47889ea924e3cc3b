"""Bitonic-merge layout experiments for the package-merge codebook (r4).

VERDICT r3: the top-tier codebook (`device_code_lengths` cap=65536) costs
24.6 ms of the 41.5 ms wide30k fused encode — and cap=32768 measures
46.3 ms, 1.9x the BIGGER tier, an unexplained pathology in the r3 bitonic
merge. Hypothesis: the merge's sub-128-stride passes (k = 64..1) reshape
the minor dim below a lane tile, forcing lane-crossing relayouts, and
every pass materializes ~47-85 us of overhead against ~2 us of raw
bandwidth.

Variants (all produce the ascending merge of two sorted uint32 arrays):
  cur    the shipping 1-D interleave formulation (ops/device_codebook.py)
  sort   jax.lax.sort of the concatenation (the r2 formulation)
  split  passes with stride >= 128 in (R,128) row-major layout (minor dim
         untouched), then ONE transpose to (128, R) where strides 64..1
         are leading-dim regroups with the minor dim (R >= 256) intact

Each variant is measured standalone (amortized in-jit, K>=40) and inside
the full `device_code_lengths` (clear_cache + monkeypatch between runs),
at every tier cap including the anomalous 32768.

Usage: python scripts/exp_merge.py [iters]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def _merge_sort(a, b):
    import jax

    return jax.lax.sort(jax.numpy.concatenate([a, b]))


def _merge_split(a, b):
    """Layout-aware bitonic merge: minor-dim-preserving passes only."""
    import jax.numpy as jnp

    x = jnp.concatenate([a, b[::-1]])
    n = x.shape[0]
    if n < 128 * 256:  # T-layout minor dim would drop below 2 lane tiles
        from huffman_tpu.ops.device_codebook import _bitonic_merge_u32

        return _bitonic_merge_u32(a, b)
    R = n // 128
    k = n // 2
    while k >= 128:
        y = x.reshape(-1, 2, k)
        lo = jnp.minimum(y[:, 0], y[:, 1])
        hi = jnp.maximum(y[:, 0], y[:, 1])
        x = jnp.stack([lo, hi], axis=1).reshape(n)
        k //= 2
    t = x.reshape(R, 128).T  # (128, R): element i=r*128+c at t[c, r]
    while k >= 1:
        y = t.reshape(64 // k, 2, k, R)
        lo = jnp.minimum(y[:, 0], y[:, 1])
        hi = jnp.maximum(y[:, 0], y[:, 1])
        t = jnp.stack([lo, hi], axis=1).reshape(128, R)
        k //= 2
    return t.T.reshape(n)


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.ops import device_codebook as dc
    from huffman_tpu.utils.timing import amortized_time_fn

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rng = np.random.default_rng(11)
    variants = [
        ("cur", dc._bitonic_merge_u32),
        ("sort", _merge_sort),
        ("split", _merge_split),
    ]

    print("== standalone merge of two sorted (K,) uint32 ==", flush=True)
    for K in (4096, 8192, 16384, 32768, 65536):
        a = np.sort(rng.integers(0, 1 << 31, K, dtype=np.uint32))
        b = np.sort(rng.integers(0, 1 << 31, K, dtype=np.uint32))
        ref = np.sort(np.concatenate([a, b]))
        a_dev = jax.device_put(jnp.asarray(a))
        b_dev = jax.device_put(jnp.asarray(b))
        for name, m in variants:
            got = np.asarray(jax.jit(m)(a_dev, b_dev))
            assert np.array_equal(got, ref), (name, K)
            # The xor-chained timing input perturbs a[0]; the networks are
            # data-oblivious so timing is unaffected.
            sec = amortized_time_fn(lambda av, m=m: m(av, b_dev), a_dev, iters)
            print(f"merge K={K:6d} {name:6s} {sec*1e6:9.1f} us", flush=True)

    print("== full device_code_lengths (max_len=18) per cap ==", flush=True)
    from huffman_tpu.constants import MAX_SYMBOLS

    from huffman_tpu.utils.benchmark import silesia_like

    data = silesia_like(16 << 20, seed=7)
    symbols = data[: data.size & ~1].view("<u2").astype(np.int32)
    freqs = np.bincount(symbols, minlength=MAX_SYMBOLS).astype(np.int32)
    hist_dev = jax.device_put(jnp.asarray(freqs))
    ref_len = None
    orig = dc._bitonic_merge_u32
    try:
        for name, m in variants:
            dc._bitonic_merge_u32 = m
            dc.device_code_lengths.clear_cache()
            for cap in (4096, 8192, 16384, 32768, 65536):
                fn = functools.partial(
                    dc.device_code_lengths, max_len=18, alphabet_cap=cap
                )
                got = np.asarray(fn(hist_dev))
                if ref_len is None:
                    ref_len = got
                assert np.array_equal(got, ref_len), (name, cap)
                sec = amortized_time_fn(fn, hist_dev, iters)
                print(
                    f"codebook cap={cap:6d} {name:6s} {sec*1e3:9.3f} ms",
                    flush=True,
                )
    finally:
        dc._bitonic_merge_u32 = orig
        dc.device_code_lengths.clear_cache()


if __name__ == "__main__":
    main()
