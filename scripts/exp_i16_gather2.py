"""Mosaic i16 probe round 2: gather with SAME-bitwidth (i16) indices,
i16 bitwise arithmetic, and the 32<->16 bitcast relayouts the 16-bit
translate-pass scheme needs. Round 1 established: i16 `where` PASSES;
i16 gather with i32 indices fails with "Gather indices and result have
different bitwidths" — so the index operand must be i16 too.
"""

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")


def main():
    from huffman_tpu.utils.chiplock import guard_chip

    guard_chip()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def run(name, fn, args, want):
        try:
            got = np.asarray(fn(*args))
            ok = np.array_equal(got, want)
            print(f"{name:46s} {'PASS' if ok else 'WRONG'}", flush=True)
            if not ok:
                print("  got ", got.reshape(-1)[:8])
                print("  want", want.reshape(-1)[:8])
        except Exception as e:
            print(f"{name:46s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:70]}", flush=True)
            traceback.print_exc(limit=1, file=sys.stderr)

    t2 = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    m2 = rng.integers(0, 256, size=(8, 256)).astype(np.int32)
    m16 = m2.astype(np.int16)

    # --- 1. i16 gather with i16 indices ---------------------------------
    def k1(t_ref, m_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], m_ref[:], axis=1)

    f1 = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("take_along_axis i16 idx=i16 (8,256)", f1,
        (jnp.asarray(t2), jnp.asarray(m16)),
        np.take_along_axis(t2, m2, axis=1))

    # --- 2. same on (8,128) ----------------------------------------------
    def k2(t_ref, m_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], m_ref[:], axis=1)

    f2 = pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16)
    )
    run("take_along_axis i16 idx=i16 (8,128)", f2,
        (jnp.asarray(t2[:, :128]), jnp.asarray((m16[:, :128] & 127))),
        np.take_along_axis(t2[:, :128], m2[:, :128] & 127, axis=1))

    # --- 3. i16 bitwise shift / and / add -------------------------------
    x16 = rng.integers(0, 32767, size=(8, 256)).astype(np.int16)

    def k3(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = ((x >> 8) & jnp.int16(127)) + (x & jnp.int16(255))

    f3 = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("i16 shift/and/add (8,256)", f3,
        (jnp.asarray(x16),),
        (((x16 >> 8) & 127) + (x16 & 255)).astype(np.int16))

    # --- 4. bitcast i32 (8,128) <-> i16 (8,256) in-kernel ----------------
    w = rng.integers(0, 2**32, size=(8, 128), dtype=np.uint64).astype(np.uint32)

    def k4(w_ref, o_ref):
        h = pltpu.bitcast(w_ref[:], jnp.int16)  # expect (8,256)
        o_ref[:] = pltpu.bitcast(h, jnp.int32)

    f4 = pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
    )
    run("bitcast i32<->i16 roundtrip (8,128)", f4,
        (jnp.asarray(w.view(np.int32)),), w.view(np.int32))

    # --- 5. the full 16-bit leaf: broadcast i16 row + i16 idx gather -----
    row = rng.integers(-32768, 32767, size=(1, 256)).astype(np.int16)

    def k5(t_ref, m_ref, o_ref):
        r = jnp.broadcast_to(t_ref[0:1, :], (8, 256))
        o_ref[:] = jnp.take_along_axis(r, m_ref[:], axis=1)

    f5 = pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("broadcast-row i16 gather idx=i16 (8,256)", f5,
        (jnp.asarray(row), jnp.asarray(m16)),
        np.take_along_axis(np.broadcast_to(row, (8, 256)), m2, axis=1))

    # --- 6. i16 compare-free predicate where: pred widened from i16 ------
    def k6(x_ref, a_ref, b_ref, o_ref):
        bit = (x_ref[:].astype(jnp.int32) & 4) != 0
        o_ref[:] = jnp.where(bit, a_ref[:], b_ref[:])

    a = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    b = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    f6 = pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("where(i16->i32 bit pred) i16 (8,256)", f6,
        (jnp.asarray(x16), jnp.asarray(a), jnp.asarray(b)),
        np.where((x16.astype(np.int32) & 4) != 0, a, b))


if __name__ == "__main__":
    main()
