"""On-chip validation + timing of the single-kernel Pallas package-merge
(`ops/device_codebook._pm_kernel`, r4) against the XLA round-loop twin.

Usage: python scripts/exp_pm.py [iters]
"""

import functools
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.constants import MAX_SYMBOLS
    from huffman_tpu.ops.device_codebook import device_code_lengths
    from huffman_tpu.utils.benchmark import silesia_like, zipf_pairs
    from huffman_tpu.utils.timing import amortized_time_fn

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rng = np.random.default_rng(5)

    corpora = {
        "silesia3k": silesia_like(16 << 20, seed=7),
        "wide30k": zipf_pairs(16 << 20, 30000, rng),
    }
    hists = {}
    for name, data in corpora.items():
        sym = data[: data.size & ~1].view("<u2").astype(np.int32)
        hists[name] = jax.device_put(jnp.asarray(
            np.bincount(sym, minlength=MAX_SYMBOLS).astype(np.int32)
        ))
    # adversarial: full alphabet + fibonacci skew (deep optimal tree)
    fib = [1, 1]
    while len(fib) < 44:
        fib.append(fib[-1] + fib[-2])
    f = np.ones(MAX_SYMBOLS, np.int64)
    f[: len(fib)] = fib[::-1]
    hists["fib-full"] = jax.device_put(
        jnp.asarray(np.clip(f, 1, (1 << 30) - 1).astype(np.int32))
    )

    for ml in (18, 32):
        for cap in (4096, 16384, 32768, 65536):
            for name, h in hists.items():
                want = np.asarray(
                    device_code_lengths(h, max_len=ml, alphabet_cap=cap)
                )
                got = np.asarray(device_code_lengths(
                    h, max_len=ml, alphabet_cap=cap, use_kernel=True
                ))
                assert np.array_equal(got, want), (ml, cap, name)
            print(f"bit-identical ml={ml} cap={cap} ({len(hists)} corpora)",
                  flush=True)
    h = hists["silesia3k"]
    for cap in (4096, 16384, 32768, 65536):
        for tag, kw in (("xla", {}), ("kern", {"use_kernel": True})):
            sec = amortized_time_fn(
                functools.partial(device_code_lengths, max_len=18,
                                  alphabet_cap=cap, **kw),
                h, iters)
            print(f"codebook ml=18 cap={cap:6d} {tag:5s} {sec*1e3:8.3f} ms",
                  flush=True)
    sec = amortized_time_fn(
        functools.partial(device_code_lengths, max_len=32,
                          alphabet_cap=65536, use_kernel=True),
        h, iters)
    print(f"codebook ml=32 cap=65536  kern {sec*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
