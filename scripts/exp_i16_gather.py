"""Mosaic capability probe: int16 lane ops on the v5e.

The wide-alphabet translate pass is bound by its per-row leaf gathers
(+ selects) over int32 lanes; int16 lanes would pack the table 2x denser
(half the rows) AND cover 2x elements per op — a potential ~4x. Known
v5e gaps: int8/int16 vector cmpi and unsigned min/max do not legalize
(CLAUDE.md); this probes dynamic lane gather + select in int16.

Each probe compiles a tiny kernel, checks bit-exactness vs numpy, and
reports PASS/FAIL — failures cost one line, not the harness.
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
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)

    def run(name, fn, args, want):
        try:
            got = np.asarray(fn(*args))
            ok = np.array_equal(got, want)
            print(f"{name:44s} {'PASS' if ok else 'WRONG'}", flush=True)
            if not ok:
                print("  got ", got.reshape(-1)[:8])
                print("  want", want.reshape(-1)[:8])
        except Exception as e:
            print(f"{name:44s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:80]}", flush=True)
            traceback.print_exc(limit=1, file=sys.stderr)

    # --- 1. int16 take_along_axis, 128 lanes ---------------------------
    t = rng.integers(-32768, 32767, size=(8, 128)).astype(np.int16)
    m = rng.integers(0, 128, size=(8, 128)).astype(np.int32)

    def k1(t_ref, m_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], m_ref[:], axis=1)

    f1 = pl.pallas_call(
        k1,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16),
    )
    run("take_along_axis i16 idx=i32 (8,128)", f1,
        (jnp.asarray(t), jnp.asarray(m)),
        np.take_along_axis(t, m, axis=1))

    # --- 2. int16 take_along_axis, 256 logical lanes --------------------
    t2 = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    m2 = rng.integers(0, 256, size=(8, 256)).astype(np.int32)

    def k2(t_ref, m_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], m_ref[:], axis=1)

    f2 = pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16),
    )
    run("take_along_axis i16 idx=i32 (8,256)", f2,
        (jnp.asarray(t2), jnp.asarray(m2)),
        np.take_along_axis(t2, m2, axis=1))

    # --- 3. where on int16 ----------------------------------------------
    a = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    b = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    p = rng.integers(0, 2, size=(8, 256)).astype(np.int32)

    def k3(p_ref, a_ref, b_ref, o_ref):
        o_ref[:] = jnp.where(p_ref[:] != 0, a_ref[:], b_ref[:])

    f3 = pl.pallas_call(
        k3,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16),
    )
    run("where(i32-pred) i16 (8,256)", f3,
        (jnp.asarray(p), jnp.asarray(a), jnp.asarray(b)),
        np.where(p != 0, a, b))

    # --- 4. i16 gather from broadcast row (the leaf shape) ---------------
    row = rng.integers(-32768, 32767, size=(1, 256)).astype(np.int16)

    def k4(t_ref, m_ref, o_ref):
        r = jnp.broadcast_to(t_ref[0:1, :], (8, 256))
        o_ref[:] = jnp.take_along_axis(r, m_ref[:], axis=1)

    f4 = pl.pallas_call(
        k4,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16),
    )
    run("broadcast-row i16 gather (8,256)", f4,
        (jnp.asarray(row), jnp.asarray(m2)),
        np.take_along_axis(np.broadcast_to(row, (8, 256)), m2, axis=1))

    # --- 4b. bf16 variants: same 16-bit packing, native float type ------
    # (gather/select are pure bit movement, so int16 data can ride bf16
    # lanes via bitcast even when patterns alias NaNs)
    t2f = t2.view(np.uint16)

    def k4b(t_ref, m_ref, o_ref):
        tf = pltpu.bitcast(t_ref[:], jnp.bfloat16)
        g = jnp.take_along_axis(tf, m_ref[:], axis=1)
        o_ref[:] = pltpu.bitcast(g, jnp.int16)

    from jax.experimental.pallas import tpu as pltpu  # noqa: E402

    f4b = pl.pallas_call(
        k4b,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16),
    )
    run("take_along_axis bf16(bitcast i16) (8,256)", f4b,
        (jnp.asarray(t2), jnp.asarray(m2)),
        np.take_along_axis(t2, m2, axis=1))

    def k4c(p_ref, a_ref, b_ref, o_ref):
        af = pltpu.bitcast(a_ref[:], jnp.bfloat16)
        bf = pltpu.bitcast(b_ref[:], jnp.bfloat16)
        o_ref[:] = pltpu.bitcast(
            jnp.where(p_ref[:] != 0, af, bf), jnp.int16
        )

    f4c = pl.pallas_call(
        k4c,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16),
    )
    run("where(i32-pred) bf16(bitcast) (8,256)", f4c,
        (jnp.asarray(p), jnp.asarray(a), jnp.asarray(b)),
        np.where(p != 0, a, b))

    # --- 5. i16 index operand -------------------------------------------
    m16 = m2.astype(np.int16)

    def k5(t_ref, m_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            t_ref[:], m_ref[:].astype(jnp.int32), axis=1
        )

    f5 = pl.pallas_call(
        k5,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16),
    )
    run("take_along_axis i16 idx=i16->i32 (8,256)", f5,
        (jnp.asarray(t2), jnp.asarray(m16)),
        np.take_along_axis(t2, m2, axis=1))


if __name__ == "__main__":
    main()
