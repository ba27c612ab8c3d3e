"""Round-3 microbenchmarks: what can beat XLA's ~7 ns/row gather floor?

The frame's remaining XLA glue (VERDICT r2 item 1) is dominated by row
gathers and payload sorts:
  * fwd pair-row gather: B=4.5M rows x 40B        ~32 ms
  * bwd rank sort: 6 u32 operands x 4.5M rows     ~24 ms
  * take_rows + VJP: (1M, 11) gathers + inv sort  ~27 ms
This script measures candidate replacement primitives on the real chip.

Methodology: the axon dev tunnel has a ~30-70 ms per-dispatch floor and
block_until_ready does not reliably wall-time small ops, so every
measurement is the MARGINAL cost between a k=1 and k=1+K scan of the op
inside ONE dispatch, with a host fetch of a scalar reduction.

Run: JAX_PLATFORMS=tpu python scripts/exp_fuse.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
K_ITERS = int(os.environ.get('K_ITERS', '10'))


def marginal(make_fn, *args, label=""):
    """Marginal per-iteration ms between k=1 and k=1+K_ITERS scans."""
    f1, fk = jax.jit(make_fn(1)), jax.jit(make_fn(1 + K_ITERS))
    jax.device_get(f1(*args))
    jax.device_get(fk(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter(); jax.device_get(f1(*args)); t1 = time.perf_counter()
        jax.device_get(fk(*args)); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / K_ITERS * 1e3)
    print(f"{label}: {best:7.2f} ms")
    return best


def scan_wrap(op, k):
    """Build fn(*args) scanning `op(j, *args)` k times, summing a scalar probe."""
    def fn(*args):
        def body(c, j):
            return c + op(j, *args), 0
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(k))
        return c
    return fn


def main():
    sections = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else {"1", "2", "3", "4", "5"}
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    N = 1_000_000
    B = 4_500_000

    table = jax.random.normal(key, (N, 10), jnp.float32)
    idx = jax.random.randint(key, (B,), 0, N, jnp.int32)

    # --- 1. XLA gather variants ----------------------------------------------
    if "1" in sections:
        def g_f32(j, t, i):
            return jnp.take(t, (i + j) % N, axis=0).sum()
        ms = marginal(lambda k: scan_wrap(g_f32, k), table, idx,
                      label="1a XLA gather (4.5M,10)f32")
        print(f"     -> {ms*1e6/B:.2f} ns/row")

        tb16 = table.astype(jnp.bfloat16)
        def g_bf16(j, t, i):
            return jnp.take(t, (i + j) % N, axis=0).sum().astype(jnp.float32)
        marginal(lambda k: scan_wrap(g_bf16, k), tb16, idx,
                 label="1b XLA gather (4.5M,10)bf16")

        def g_1col(j, t, i):
            return jnp.take(t, (i + j) % N).sum()
        marginal(lambda k: scan_wrap(g_1col, k), table[:, 0], idx,
                 label="1c XLA gather (4.5M,)f32 1col")

        idx_s = jnp.sort(idx)
        marginal(lambda k: scan_wrap(g_f32, k), table, idx_s,
                 label="1d XLA gather sorted idx")

    # --- 2. sort payload scaling at binning / VJP sizes -----------------------
    if "2" in sections:
        M = 7_000_000
        keys7 = jax.random.bits(key, (M,), jnp.uint32)
        pays7 = [jax.random.bits(jax.random.fold_in(key, j), (M,), jnp.uint32)
                 for j in range(5)]
        for nops in [int(x) for x in os.environ.get('SORT_NOPS', '0,1,3,5').split(',')]:
            def s_op(j, k0, *ps):
                out = jax.lax.sort((k0 + j.astype(jnp.uint32), *ps), num_keys=1)
                return sum(o[::65536].sum().astype(jnp.float32) for o in out)
            marginal(lambda k: scan_wrap(s_op, k), keys7, *pays7[:nops],
                     label=f"2  sort 7M key+{nops} u32 payload")

        keysB = jax.random.randint(key, (B,), 0, N, jnp.int32)
        paysB = [jax.random.bits(jax.random.fold_in(key, 10 + j), (B,), jnp.uint32)
                 for j in range(5)]
        def sB_op(j, k0, *ps):
            out = jax.lax.sort((k0 + j, *ps), num_keys=1)
            return sum(o[::65536].sum().astype(jnp.float32) for o in out)
        marginal(lambda k: scan_wrap(sB_op, k), keysB, *paysB,
                 label="2b sort 4.5M key+5 u32 (VJP)")

    # --- 3. Pallas in-kernel VMEM gather: does jnp.take lower? -----------------
    if "3" in sections:
        W = 1024
        tb = jax.random.normal(key, (W, 16), jnp.float32)
        gidx = jax.random.randint(key, (8, 128), 0, W, jnp.int32)

        def take_kernel(t_ref, i_ref, o_ref):
            for c in range(8):
                o_ref[c * 128:(c + 1) * 128, :] = jnp.take(
                    t_ref[:, :], i_ref[c, :], axis=0)

        G = 512
        try:
            fn_g = pl.pallas_call(
                take_kernel,
                grid=(G,),
                out_shape=jax.ShapeDtypeStruct((G * 1024, 16), jnp.float32),
                in_specs=[
                    pl.BlockSpec((W, 16), lambda g: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1024, 16), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
            )
            r = jax.jit(fn_g)(tb, gidx)
            ok = np.allclose(np.asarray(r[:128]), np.asarray(tb)[np.asarray(gidx[0])])
            def p_op(j, t, i):
                return fn_g(t + 0.0 * j.astype(jnp.float32), i)[::4096].sum()
            ms = marginal(lambda k: scan_wrap(p_op, k), tb, gidx,
                          label=f"3  Pallas jnp.take VMEM W={W} (correct={ok})")
            print(f"     -> {ms*1e6/(G*1024):.2f} ns/row")
        except Exception as e:
            print(f"3  Pallas jnp.take VMEM: FAILED: {type(e).__name__}: {str(e)[:300]}")

        # 3b: gather along lanes (feature-major table)
        try:
            tbl = jax.random.normal(key, (16, W), jnp.float32)
            gidxl = jax.random.randint(key, (16, 128), 0, W, jnp.int32)

            def taa_kernel(t_ref, i_ref, o_ref):
                o_ref[:, :] = jnp.take_along_axis(t_ref[:, :], i_ref[:, :], axis=1)

            fnl = pl.pallas_call(
                taa_kernel,
                grid=(G,),
                out_shape=jax.ShapeDtypeStruct((16, G * 128), jnp.float32),
                in_specs=[
                    pl.BlockSpec((16, W), lambda g: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((16, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((16, 128), lambda g: (0, g),
                                       memory_space=pltpu.VMEM),
            )
            rl = jax.jit(fnl)(tbl, gidxl)
            okl = np.allclose(np.asarray(rl[:, :128]),
                              np.take_along_axis(np.asarray(tbl), np.asarray(gidxl), 1))
            def pl_op(j, t, i):
                return fnl(t + 0.0 * j.astype(jnp.float32), i)[:, ::4096].sum()
            ms = marginal(lambda k: scan_wrap(pl_op, k), tbl, gidxl,
                          label=f"3b Pallas take_along_axis lanes (correct={okl})")
            print(f"     -> {ms*1e6/(G*128):.2f} ns/col(x16feat)")
        except Exception as e:
            print(f"3b Pallas take_along_axis: FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- 4. Pallas one-hot MXU gather (window=128) -----------------------------
    if "4" in sections:
        G = 512
        W = 1024
        tb = jax.random.normal(key, (W, 16), jnp.float32)
        def onehot_kernel(t_ref, i_ref, o_ref):
            for c in range(8):
                idxv = i_ref[c:c + 1, :]
                rows_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                oh = (rows_i == idxv).astype(jnp.float32)
                o_ref[c * 128:(c + 1) * 128, :] = jax.lax.dot_general(
                    oh, t_ref[:128, :], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        gidx128 = jax.random.randint(key, (8, 128), 0, 128, jnp.int32)
        fno = pl.pallas_call(
            onehot_kernel,
            grid=(G,),
            out_shape=jax.ShapeDtypeStruct((G * 1024, 16), jnp.float32),
            in_specs=[
                pl.BlockSpec((W, 16), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1024, 16), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )
        r = jax.jit(fno)(tb, gidx128)
        ok = np.allclose(np.asarray(r[:128]), np.asarray(tb)[np.asarray(gidx128[0])])
        def o_op(j, t, i):
            return fno(t + 0.0 * j.astype(jnp.float32), i)[::4096].sum()
        ms = marginal(lambda k: scan_wrap(o_op, k), tb, gidx128,
                      label=f"4  Pallas one-hot MXU gather w=128 (correct={ok})")
        print(f"     -> {ms*1e6/(G*1024):.2f} ns/row")

    # --- 5. expansion bandwidth -------------------------------------------------
    if "5" in sections:
        def r_op(j, t):
            return jnp.repeat(t + 0.0 * j.astype(jnp.float32), 4, axis=0)[::512].sum()
        marginal(lambda k: scan_wrap(r_op, k), table, label="5  jnp.repeat K=4 (->4M,10)")


if __name__ == "__main__":
        main()
