"""Rank-select gather per_cell sweep at the WIDE dense-table caps.

The wide-alphabet fused encode's largest stage after round 4 is the
rank-select dense gather (RESULTS: 6.34 ms / 16 MiB at cap 32768,
11.28 at 65536 — the select tree is linear in dense-table rows). The
grid-cell size (tiles per cell) trades pipeline startup against block
size; the decoder's pair-gather sweep showed a measurable spread
(per_cell 32/64/128/256 = 2.50/2.48/2.78/2.64 ms on a 120-row table).
This sweeps the same knob on the encode-side gather at each ladder cap,
bit-checked against the numpy twin before timing.

Usage: python scripts/exp_rank_gather.py [size_mb] [caps] [schemes]

``caps``/``schemes`` are comma-separated filters (each Mosaic variant is
a fresh ~60-90 s compile; the full grid exceeds the 1500 s chip runtime
bound, so run narrow invocations).
"""

import functools
import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax
    import jax.numpy as jnp

    from huffman_tpu.ops.pallas_gather import (
        build_rank_select, gather_rank_select,
    )
    from huffman_tpu.utils.benchmark import zipf_pairs
    from huffman_tpu.utils.timing import amortized_time_fn

    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(11)

    # argv[2]: optional comma-separated cap filter (each Mosaic variant is
    # a fresh ~30 s compile; the full grid exceeds the 1500 s chip bound —
    # run per-cap invocations instead).
    cap_filter = (
        {int(x) for x in sys.argv[2].split(",")} if len(sys.argv) > 2 else None
    )
    scheme_filter = (
        set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    )
    for n_unique, cap in (
        (30000, 32768), (60000, 65536), (3900, 4096), (12000, 16384),
    ):
        if cap_filter is not None and cap not in cap_filter:
            continue
        data = zipf_pairs(size_mb << 20, n_unique, rng)
        symbols = data.view("<u2").astype(np.int32)
        present = np.zeros(65536, bool)
        present[np.unique(symbols)] = True
        values = (np.arange(65536, dtype=np.uint32) * 2654435761) & 0xFFFFFFFF
        maskw, cums, dense, ok = build_rank_select(values, present, cap=cap)
        assert ok
        want = values[symbols]
        sym_dev, maskw_d, cums_d, dense_d = (
            jax.device_put(jnp.asarray(a))
            for a in (symbols, maskw, cums, dense)
        )

        # The per-cap per_cell ladder for the PACKED scheme is committed
        # (perflogs/r4c_exp_rank_gather.log + the 32768 re-run in
        # r5_rank_canon.log); default-only here keeps each invocation
        # inside the chip runtime bound.
        for per_cell in (None,) if scheme_filter is None else ():
            fn = functools.partial(
                gather_rank_select, maskwords=maskw_d, cums=cums_d,
                dense=dense_d, per_cell=per_cell,
            )
            name = f"cap={cap:5d} n={n_unique:5d} per_cell={str(per_cell):>4s}"
            try:
                got = np.asarray(fn(sym_dev))
                assert np.array_equal(got, want), f"{name} WRONG"
                sec = amortized_time_fn(fn, sym_dev, iters=40)
                gbps = symbols.size * 2 / sec / 1e9
                print(f"{name}: {sec * 1e3:7.3f} ms  {gbps:6.2f} GB/s",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                traceback.print_exc(limit=2, file=sys.stderr)

        # ---- two-level canonical-rank scheme (r5) on a REAL codebook ----
        # The canonical gather derives codes arithmetically from canonical
        # ranks, so its sweep needs a genuine codebook (lengths/base/start)
        # over the same corpus rather than the synthetic hash payload.
        canon_sweep(size_mb, n_unique, cap, symbols, scheme_filter)


def canon_sweep(size_mb, n_unique, cap, symbols, scheme_filter=None):
    import jax.numpy as jnp

    from huffman_tpu.constants import MAX_CODE_LEN
    from huffman_tpu.ops.device_codebook import (
        device_canonical_tables, device_code_lengths,
    )
    from huffman_tpu.ops.pallas_gather import (
        build_rank_select, gather_rank_canonical, gather_rank_select,
    )
    from huffman_tpu.utils.timing import amortized_time_fn

    hist = np.bincount(symbols, minlength=65536).astype(np.int32)
    lengths = device_code_lengths(
        jnp.asarray(hist), max_len=18, alphabet_cap=cap, use_kernel=True
    )
    enc_codes, enc_lens, _lj, base, sym_rank = device_canonical_tables(lengths)
    enc_packed = (enc_lens.astype(jnp.uint32) << 26) | enc_codes
    want = np.asarray(enc_packed)[symbols]

    mw, cm, dn, ok = build_rank_select(enc_packed, lengths > 0, cap=cap)
    mw2, cm2, dn2, ok2 = build_rank_select(
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
    sym_dev = jnp.asarray(symbols)

    schemes = [("packed", (None,)), ("canon", (None, 16, 32, 64, 128, 256))]
    if cap >= 65536:
        # Full-alphabet identity addressing: table = sym_rank itself.
        sr = sym_rank.astype(jnp.uint32)
        canon16_id = sr[0::2] | (sr[1::2] << 16)
        schemes.append(("canonid", (None, 16, 32, 64)))
    for scheme, per_cells in schemes:
        if scheme_filter is not None and scheme not in scheme_filter:
            continue
        timings = {}
        for per_cell in per_cells:
            if scheme == "packed":
                fn = functools.partial(
                    gather_rank_select, maskwords=mw, cums=cm, dense=dn,
                    per_cell=per_cell,
                )
            elif scheme == "canonid":
                fn = functools.partial(
                    gather_rank_canonical, maskwords=mw2, cums=cm2,
                    canon16=canon16_id, start=start, base=base, max_len=18,
                    per_cell=per_cell, identity_rank=True,
                )
            else:
                fn = functools.partial(
                    gather_rank_canonical, maskwords=mw2, cums=cm2,
                    canon16=canon16, start=start, base=base, max_len=18,
                    per_cell=per_cell,
                )
            name = (f"cap={cap:5d} n={n_unique:5d} {scheme:6s} "
                    f"per_cell={str(per_cell):>4s}")
            try:
                got = np.asarray(fn(sym_dev))
                assert np.array_equal(got, want), f"{name} WRONG"
                sec = amortized_time_fn(fn, sym_dev, iters=40)
                timings[per_cell] = sec
                gbps = symbols.size * 2 / sec / 1e9
                print(f"{name}: {sec * 1e3:7.3f} ms  {gbps:6.2f} GB/s",
                      flush=True)
            except Exception as e:
                print(f"{name}: FAIL {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                traceback.print_exc(limit=2, file=sys.stderr)
        # Tuned-default audit (VERDICT r4 #6): the shipping default
        # (per_cell=None) must sit within noise of this sweep's best —
        # a drifted default prints loudly instead of silently shipping.
        if None in timings and len(timings) > 1:
            best_pc = min(timings, key=timings.get)
            d, b = timings[None], timings[best_pc]
            verdict = "OK" if d <= b * 1.05 else "STALE"
            print(f"cap={cap:5d} {scheme:6s} DEFAULT_{verdict}: default "
                  f"{d*1e3:.3f} ms vs best {b*1e3:.3f} (per_cell="
                  f"{best_pc})", flush=True)


if __name__ == "__main__":
    main()
