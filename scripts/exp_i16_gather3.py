"""Mosaic i16 probe round 3: direct lax.gather with SAME-width i16
indices (jnp.take_along_axis normalizes indices to i32, which trips
Mosaic's "Gather indices and result have different bitwidths"; the
lowering rule passes the index element type through, so a hand-built
lax.gather with i16 indices should reach tpu.dynamic_gather legally).
Plus the i16->i32 widening cast the select-tree predicates need.
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
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def run(name, fn, args, want):
        try:
            got = np.asarray(fn(*args))
            ok = np.array_equal(got, want)
            print(f"{name:46s} {'PASS' if ok else 'WRONG'}", flush=True)
        except Exception as e:
            print(f"{name:46s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:70]}", flush=True)
            traceback.print_exc(limit=1, file=sys.stderr)

    DN = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )

    def lane_gather_i16(data, idx16):
        return lax.gather(
            data, idx16[..., None], DN, (1, 1),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    t2 = rng.integers(-32768, 32767, size=(8, 256)).astype(np.int16)
    m2 = rng.integers(0, 256, size=(8, 256)).astype(np.int32)
    m16 = m2.astype(np.int16)

    # --- 1. direct lax.gather i16 data, i16 idx --------------------------
    def k1(t_ref, m_ref, o_ref):
        o_ref[:] = lane_gather_i16(t_ref[:], m_ref[:])

    f1 = pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("lax.gather i16 idx=i16 (8,256)", f1,
        (jnp.asarray(t2), jnp.asarray(m16)),
        np.take_along_axis(t2, m2, axis=1))

    # --- 2. same from a broadcast row (the tree leaf shape) --------------
    row = rng.integers(-32768, 32767, size=(1, 256)).astype(np.int16)

    def k2(t_ref, m_ref, o_ref):
        r = jnp.broadcast_to(t_ref[0:1, :], (8, 256))
        o_ref[:] = lane_gather_i16(r, m_ref[:])

    f2 = pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("lax.gather broadcast-row i16 (8,256)", f2,
        (jnp.asarray(row), jnp.asarray(m16)),
        np.take_along_axis(np.broadcast_to(row, (8, 256)), m2, axis=1))

    # --- 3. i16 -> i32 widening cast -------------------------------------
    def k3(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int32)

    f3 = pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32)
    )
    run("astype i16->i32 (8,256)", f3,
        (jnp.asarray(t2),), t2.astype(np.int32))

    # --- 4. i32 -> i16 truncating cast -----------------------------------
    x32 = rng.integers(0, 65536, size=(8, 256)).astype(np.int32)

    def k4(x_ref, o_ref):
        o_ref[:] = x_ref[:].astype(jnp.int16)

    f4 = pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int16)
    )
    run("astype i32->i16 (8,256)", f4,
        (jnp.asarray(x32),), x32.astype(np.int16))

    # --- 5. end-to-end mini pair-translate tile --------------------------
    # table (4, 256) i16, packed rank pairs (8,128) i32 -> packed symbol
    # pairs (8,128) i32, all index math in i32, data moves in i16.
    tab = rng.integers(-32768, 32767, size=(4, 256)).astype(np.int16)
    n_entries = 4 * 256
    lo = rng.integers(0, n_entries, size=(8, 128)).astype(np.uint32)
    hi = rng.integers(0, n_entries, size=(8, 128)).astype(np.uint32)
    w = (lo | (hi << 16)).view(np.int32)

    def k5(tab_ref, w_ref, o_ref):
        wv = w_ref[:]
        l32 = wv & 0xFFFF
        h32 = (wv >> 16) & 0xFFFF
        m = pltpu.bitcast(
            (l32 & 255) | ((h32 & 255) << 16), jnp.int16
        )  # (8,256) interleaved lane indices
        rl = l32 >> 8
        rh = h32 >> 8
        nodes = []
        for q in range(tab_ref.shape[0]):
            rowq = jnp.broadcast_to(tab_ref[q : q + 1, :], (8, 256))
            nodes.append(lane_gather_i16(rowq, m))
        k = 0
        while len(nodes) > 1:
            bitp = pltpu.bitcast(
                ((rl >> k) & 1) | ((rh >> k) & 1) << 16, jnp.int16
            ).astype(jnp.int32) != 0
            nodes = [
                jnp.where(bitp, nodes[q + 1], nodes[q])
                if q + 1 < len(nodes) else nodes[q]
                for q in range(0, len(nodes), 2)
            ]
            k += 1
        o_ref[:] = pltpu.bitcast(nodes[0], jnp.int32)

    f5 = pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
    )
    tl = tab.reshape(-1).view(np.uint16).astype(np.uint32)
    want5 = (tl[lo] | (tl[hi] << 16)).view(np.int32)
    run("mini 16-bit pair-translate tile", f5,
        (jnp.asarray(tab), jnp.asarray(w)), want5)


if __name__ == "__main__":
    main()
