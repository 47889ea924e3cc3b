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
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
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
    # — past the fast tier (alphabet_cap / rank-select dictionary), so the
    # default run must FLAG ok=False and the documented fallback rerun
    # (gather="xla", alphabet_cap=None) must match the host pipeline.
    padded = np.zeros(n_lanes * B, np.int32)
    padded[: symbols.size] = symbols
    pad_dev = jnp.asarray(padded)
    np_dev = jnp.asarray(symbols.size, jnp.int32)
    r = encode_device(pad_dev, np_dev, B, max_len=18)
    assert not bool(r["ok"]), "fast tier silently accepted a 57k alphabet"
    r = encode_device(
        pad_dev, np_dev, B, max_len=18, gather="xla", alphabet_cap=None
    )
    assert bool(r["ok"])

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

    check_fused(r, symbols, "xla-tier")
    print("3. fused encoder (xla tier, flagged fallback) matches host on chip")

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


if __name__ == "__main__":
    sys.exit(main())
