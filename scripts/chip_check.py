"""On-hardware correctness check for the Mosaic kernels and sorted
scatters (run on a real TPU; pytest runs CPU-only by policy).

CLAUDE.md rule: interpret-mode bit-exactness is NOT sufficient for scatter
code — real-TPU XLA exploits indices_are_sorted in ways the interpreter
doesn't. This script re-proves, on the chip, that:

1. the device-encoded v2 container is byte-identical to the host-encoded
   one (covers pack_streams_pallas: pack kernel, lookahead scan, monotone
   deposit scatter, preload edges);
2. the Pallas slab packer matches the XLA pack (covers its compaction
   scatters);
3. the Pallas decoder round-trips the container (covers the decode kernel
   and its refill machinery);
4. the fused all-device encoder matches the host pipeline.

Exit code 0 with CHIP_CHECK_OK on success. Part of the /verify recipe.

``--sweep [N]`` additionally runs the randomized configuration sweep
(VERDICT r1 #4): N seeds x {alphabet 2 / 600 / ~4k / ~8k / 20k-rank-tier,
max_code_len 12 / 18 / 32 / unlimited, min_len edges, odd group counts,
multi 1/2/3, exact words_cap} container roundtrips — every config must be
byte-identical device-vs-host AND decode back bit-exact on the chip —
plus the reference-format device payload (pack_stream's sorted scatter,
previously never chip-checked). Set HTPU_COMPILE_CACHE to amortize the
per-shape Mosaic compiles across invocations.
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np

# Persistent compile cache by default (same rationale as bench.py: the
# sweep is dominated by Mosaic compiles; warm it is minutes).
os.environ.setdefault("HTPU_COMPILE_CACHE", "/root/repo/.jit_cache")


def main() -> int:
    from huffman_tpu.utils.chiplock import guard_chip

    # The full --sweep grid compiles dozens of Mosaic shapes; give it a
    # wider hard bound than the 1500 s script default (still bounded —
    # VERDICT r4 weak #1).
    guard_chip(max_runtime_s=3000)

    import jax

    if jax.devices()[0].platform == "cpu":
        print("SKIP: no accelerator visible (ran on CPU)")
        return 0
    import jax.numpy as jnp

    import huffman_tpu as ht
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import GROUP_LANES, MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import encode as enc
    from huffman_tpu.ops.fused import encode_device
    from huffman_tpu.ops.pallas_encode import pack_blocks_pallas

    rng = np.random.default_rng(42)
    data = (rng.zipf(1.4, size=9_000_001) % 240).astype(np.uint8).tobytes()

    # 1. device container == host container, and it decodes on the chip
    dev = ht.compress(data, backend="jax")
    host = ht.compress(data, backend="numpy")
    assert dev == host, "device container != host container"
    assert ht.decompress(dev) == data, "TPU decode mismatch"
    print("1. device v2 container byte-identical + chip decode OK")

    # 2. Pallas slab packer == XLA packer
    symbols = np.frombuffer(data[: len(data) & ~1], dtype="<u2").astype(np.int32)
    B = 512
    n_real = (symbols.size + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    codes, lens, _ = bf._gather_device(symbols.astype(np.uint16), cb, n_lanes, B)
    offsets, bits = enc.block_offsets(lens)
    W = 64
    while W * 32 < int(np.asarray(bits).max()):
        W <<= 1
    ref = np.asarray(enc.pack_blocks(codes, lens, offsets, W))
    out = np.asarray(pack_blocks_pallas(codes, lens, W))
    assert np.array_equal(ref, out), "pallas slab pack != XLA pack on chip"
    print("2. Pallas slab packer matches XLA on chip")

    # 3. fused encoder vs host pipeline. This corpus has ~57k unique pairs
    # — since r3 the fast tier's TOP alphabet tier covers the full 16-bit
    # alphabet, so the default run must be ok=True AND byte-identical to
    # the host; an explicit alphabet_cap must still flag; and the xla
    # exact tier must also match.
    padded = np.zeros(n_lanes * B, np.int32)
    padded[: symbols.size] = symbols
    pad_dev = jnp.asarray(padded)
    np_dev = jnp.asarray(symbols.size, jnp.int32)
    r = encode_device(pad_dev, np_dev, B, max_len=18)
    assert bool(r["ok"]), "full-alphabet fast tier flagged a 57k alphabet"

    def check_fused(r, syms, tag):
        fl = np.asarray(r["lengths"]).astype(np.uint8)
        cb2 = Codebook.from_lengths(fl)
        nr = (syms.size + B - 1) // B
        nl = (nr + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
        slab, _, l2 = bf._encode_slab_numpy(syms.astype(np.uint16), cb2, nl, B)
        min_len = int(fl[fl > 0].min())
        eff = il.effective_lengths(l2, syms.size, min_len, nl, B)
        refs = il.build_streams(slab, eff, nr)
        counts = np.asarray(r["counts"])
        streams = np.asarray(r["streams"])
        for g, rs in enumerate(refs):
            assert counts[g] == rs.size and np.array_equal(
                streams[g, : counts[g]], rs
            ), (tag, g)

    check_fused(r, symbols, "full-alphabet-fast-tier")
    rcap = encode_device(pad_dev, np_dev, B, max_len=18, alphabet_cap=8192)
    assert not bool(rcap["ok"]), "explicit alphabet_cap failed to flag"
    rx = encode_device(
        pad_dev, np_dev, B, max_len=18, gather="xla", alphabet_cap=None
    )
    assert bool(rx["ok"])
    check_fused(rx, symbols, "xla-tier")
    print("3. fused encoder at a 57k alphabet (full-alphabet fast tier, "
          "capped flagging, xla exact tier) matches host on chip")

    # 4. the FAST tier (rank-select gather + capped codebook + Pallas
    # histogram) on an in-tier alphabet, bit-identical to the host.
    from huffman_tpu.utils.benchmark import silesia_like

    d2 = silesia_like(4 << 20, seed=11)
    syms2 = d2[: d2.size & ~1].view("<u2").astype(np.int32)
    nr2 = (syms2.size + B - 1) // B
    nl2 = (nr2 + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    p2 = np.zeros(nl2 * B, np.int32)
    p2[: syms2.size] = syms2
    r2 = encode_device(
        jnp.asarray(p2), jnp.asarray(syms2.size, jnp.int32), B, max_len=18
    )
    assert bool(r2["ok"]), "fast tier rejected a ~4k alphabet"
    check_fused(r2, syms2, "fast-tier")
    print("4. fused encoder FAST tier (rank-select + capped codebook + "
          "Pallas histogram) matches host on chip")

    print("CHIP_CHECK_OK")
    return 0


def _sweep_data(rng, kind, nbytes):
    """Corpus generators keyed by alphabet tier."""
    if kind == "alpha2":
        return (rng.integers(0, 2, nbytes) + 97).astype(np.uint8).tobytes()
    if kind == "text600":
        a = rng.choice(65536, 300, replace=False).astype(np.uint16)
        p = 1.0 / np.arange(1, 301) ** 1.3
        p /= p.sum()
        return rng.choice(a, nbytes // 2, p=p).astype("<u2").tobytes()
    if kind == "skew":  # near-Fibonacci skew: deep natural code lengths
        n = 40
        a = rng.choice(65536, n, replace=False).astype(np.uint16)
        w = np.array([1.45 ** -i for i in range(n)])
        w /= w.sum()
        return rng.choice(a, nbytes // 2, p=w).astype("<u2").tobytes()
    if kind == "silesia4k":
        from huffman_tpu.utils.benchmark import silesia_like

        return silesia_like(nbytes, seed=int(rng.integers(1 << 30))).tobytes()
    if kind == "wide8k":
        a = rng.choice(65536, 8000, replace=False).astype(np.uint16)
        return rng.choice(a, nbytes // 2).astype("<u2").tobytes()
    if kind == "rank20k":
        # > GATHER_MAX_ALPHABET unique symbols but still compressible:
        # exercises rank-mode decode + the in-jit rank->symbol translation.
        from huffman_tpu.utils.benchmark import zipf_pairs

        return zipf_pairs(nbytes, 20000, rng).tobytes()
    if kind.startswith("exact"):
        # EXACTLY n unique symbols: every chosen symbol occurs at least
        # once (the leading block), the rest zipf-weighted fill — lands
        # the data-adaptive tier selection precisely on a ladder rung or
        # its neighbor (constants.ALPHABET_TIERS switch boundaries, and
        # the decode in-kernel/rank boundary at GATHER_MAX_ALPHABET).
        n = int(kind[5:])
        a = rng.choice(65536, n, replace=False).astype(np.uint16)
        m = nbytes // 2
        p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** 1.1
        p /= p.sum()
        syms = np.concatenate([a, rng.choice(a, m - n, p=p)])
        rng.shuffle(syms)
        return syms.astype("<u2").tobytes()
    raise ValueError(kind)


def sweep(n_seeds: int = 3) -> int:
    import jax

    if jax.devices()[0].platform == "cpu":
        print("SKIP: no accelerator visible (ran on CPU)")
        return 0
    import huffman_tpu as ht
    from huffman_tpu.container import reference_format as rf

    # (kind, max_code_len, nbytes). Sizes stay small: the sweep's value is
    # configuration breadth, not volume; one seed of each shape class pays
    # the Mosaic compile, later seeds re-use it.
    configs = [
        ("alpha2", 18, 1 << 20),      # min_len=1 edge, 2-symbol alphabet
        ("text600", 12, 1 << 20),     # tight limit forces rebalancing
        ("text600", 18, 2 << 20),
        ("skew", 32, 1 << 20),        # deep codes at the max_len=32 edge
        ("skew", None, 1 << 20),      # unlimited: natural depth > 18
        ("silesia4k", 18, 2 << 20),   # displacement-gather fast tier
        ("wide8k", 18, 2 << 20),      # in-kernel translate boundary
        ("rank20k", 18, 2 << 20),     # rank tier + in-jit translation
        ("text600", 18, 97 << 10),    # odd tail, tiny input, 1 group
        # Tier-ladder SWITCH BOUNDARIES (VERDICT r3 #6): one config on
        # each side of every ALPHABET_TIERS rung edge, so the lax.switch
        # rung choice and the decode in-kernel/rank split (1024 since r5)
        # are exercised exactly at their decision points; exact40000
        # lands the sweep itself on the top 65536 rung (the core check's
        # 57k corpus also does, with a fixed seed).
        ("exact1023", 18, 2 << 20),  # decode in-kernel/rank boundary (r5:
        ("exact1025", 18, 2 << 20),  # GATHER_MAX_ALPHABET moved to 1024)
        ("exact4095", 18, 2 << 20),
        ("exact4097", 18, 2 << 20),
        ("exact16383", 18, 2 << 20),
        ("exact16385", 18, 2 << 20),
        ("exact32767", 18, 2 << 20),
        ("exact32769", 18, 2 << 20),
        ("exact40000", 18, 2 << 20),
    ]
    total = 0
    failures = 0
    for seed in range(n_seeds):
        rng = np.random.default_rng(1000 + seed)
        for kind, mcl, nbytes in configs:
            data = _sweep_data(rng, kind, nbytes)
            kw = {"max_code_len": mcl}
            dev = ht.compress(data, backend="jax", **kw)
            host = ht.compress(data, backend="numpy", **kw)
            okc = dev == host
            back = ht.decompress(dev)
            okd = back == data
            total += 1
            if not (okc and okd):
                failures += 1
                print(f"FAIL seed={seed} kind={kind} mcl={mcl}: "
                      f"container={'ok' if okc else 'MISMATCH'} "
                      f"decode={'ok' if okd else 'MISMATCH'}")
            else:
                print(f"ok   seed={seed} kind={kind} mcl={mcl} "
                      f"({len(data)} B -> {len(dev)} B)", flush=True)
        # reference-format device payload: the pack_stream sorted scatter
        data = _sweep_data(rng, "text600", 1 << 20)
        dev_blob = rf.compress(data, device_payload=True)
        host_blob = rf.compress(data)
        total += 1
        if dev_blob != host_blob:
            failures += 1
            print(f"FAIL seed={seed} pack_stream: reference payload mismatch")
        else:
            print(f"ok   seed={seed} pack_stream reference payload", flush=True)

        # the scale-out containers through the device path: HTPS streaming
        # (independent chunk records, pipelined) and HTPX sharded archive
        import io

        from huffman_tpu.container import sharded as shd
        from huffman_tpu.container import streaming as stm

        data = _sweep_data(rng, "silesia4k", 6 << 20)
        buf = io.BytesIO()
        stm.compress_stream(io.BytesIO(data), buf, chunk_bytes=2 << 20,
                            backend="jax")
        out = io.BytesIO()
        stm.decompress_stream(io.BytesIO(buf.getvalue()), out)
        total += 1
        if out.getvalue() != data:
            failures += 1
            print(f"FAIL seed={seed} HTPS device roundtrip")
        else:
            print(f"ok   seed={seed} HTPS device roundtrip "
                  f"({len(data)} B, 3 chunks)", flush=True)

        blob = shd.compress(data, n_shards=4, backend="jax")
        total += 1
        if shd.decompress(blob) != data:
            failures += 1
            print(f"FAIL seed={seed} HTPX device roundtrip")
        else:
            print(f"ok   seed={seed} HTPX device roundtrip (4 shards)",
                  flush=True)

    # decode multi sweep on one config (multi is a kernel ILP knob, not a
    # format property): direct kernel runs at multi 1 and 3 vs symbols.
    from huffman_tpu.codebook import Codebook
    from huffman_tpu.constants import GROUP_LANES, MAX_SYMBOLS
    from huffman_tpu.container import block_format as bf
    from huffman_tpu.container import interleave as il
    from huffman_tpu.ops import pallas_decode as pd
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    B = 512
    data = _sweep_data(rng, "silesia4k", 4 << 20)
    symbols = np.frombuffer(data[: len(data) & ~1], dtype="<u2").astype(np.int32)
    n_pairs = symbols.size
    n_real = (n_pairs + B - 1) // B
    n_lanes = (n_real + GROUP_LANES - 1) // GROUP_LANES * GROUP_LANES
    cb = Codebook.from_frequencies(np.bincount(symbols, minlength=MAX_SYMBOLS))
    slab, _, lens = bf._encode_slab_numpy(symbols.astype(np.uint16), cb, n_lanes, B)
    min_len = int(cb.lengths[cb.lengths > 0].min())
    eff = il.effective_lengths(lens, n_pairs, min_len, n_lanes, B)
    streams = il.build_streams(slab, eff, n_real)
    stacked, _ = il.pad_streams(streams)
    ngroups = n_lanes // GROUP_LANES
    rows_per = stacked.shape[0] // ngroups
    symtab, sym_rows, translate = pd.build_symtab(cb.sym_order)
    meta = np.zeros((ngroups, 4), dtype=np.int32)
    for g in range(ngroups):
        meta[g, 0] = max(0, min(GROUP_LANES, n_real - g * GROUP_LANES))
    args = (
        jnp.asarray(stacked), jnp.asarray(cb.lj_limit),
        jnp.asarray((cb.base & 0xFFFFFFFF).astype(np.uint32)),
        jnp.asarray(symtab), jnp.asarray(meta),
    )
    # Rank-tier alphabets (translate=False — silesia4k is one since the
    # r5 boundary moved to 1024) translate in-program via sym_order_dev;
    # without it the kernel's contract is to return raw ranks.
    so_dev = (
        None if translate else jnp.asarray(cb.sym_order.astype(np.int32))
    )
    for multi in (1, 2, 3, 5):
        out = np.asarray(pd.decode_groups(
            *args, B, rows_per, sym_rows, max_len=max(cb.max_len, 1),
            translate=translate, min_len=min_len, multi=multi,
            sym_order_dev=so_dev,
        ))
        dec = out.reshape(ngroups, B, 8, 128).transpose(0, 2, 3, 1).reshape(-1)[:n_pairs]
        total += 1
        if not np.array_equal(dec, symbols):
            failures += 1
            print(f"FAIL decode multi={multi}")
        else:
            print(f"ok   decode multi={multi}", flush=True)

    print(f"sweep: {total - failures}/{total} configs clean")
    if failures:
        return 1
    print("CHIP_SWEEP_OK")
    return 0


if __name__ == "__main__":
    rc = main()
    if rc == 0 and "--sweep" in sys.argv:
        i = sys.argv.index("--sweep")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 and sys.argv[i + 1].isdigit() else 3
        rc = sweep(n)
    sys.exit(rc)
