"""Feasibility probe for the round-5 bucket-permutation kernel.

The design (docs/ARCHITECTURE.md "Next levers") needs each grid program to
write a 128-lane feature block to an HBM offset computed at RUNTIME (the
running per-bucket fill cursor). This probes the two primitives it rests on:

  P1: pltpu.make_async_copy from VMEM scratch into `hbm.at[:, pl.ds(start,
      128)]` where `start` is a TRACED value (scalar-prefetch derived, not
      grid-index affine) — dynamic-offset HBM writes.
  P2: a full 128×128 in-register permutation built from comparisons +
      prefix matmuls, applied as one MXU pass (the per-chunk lane
      compaction that groups rows by bucket before the write).

Run: python scripts/exp_bucket_dma.py   (on the chip)

STATUS (end of round 4, v5e):
  P1 dynamic-offset HBM write: **OK on hardware** — the load-bearing
     primitive for the bucket kernel works (async copy to
     `hbm.at[:, pl.ds(traced_start, 128)]` with a scalar-prefetch-derived
     start lands exactly where directed).
  P2 in-register permutation: **OK on hardware** (round 5) — the round-4
     "MISMATCH" was never a miscompile. scripts/exp_bucket_debug.py
     bisected every intermediate: the comparison algebra, dst, and PT are
     all bit-correct compiled; the error was the final x@PT matmul running
     at Precision.DEFAULT, which truncates the f32 LHS to bf16 (maxerr
     7.8e-3 on N(0,1) data — the probe's allclose then failed). With
     Precision.HIGHEST the permutation apply is BIT-EXACT on hardware (and
     the 0/1 RHS makes the 2-pass split-f32 _mm_x2 scheme ~2⁻¹⁸-accurate
     if HIGHEST's 6 passes ever matter for speed).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_dynamic_write():
    """Each program writes its block at an offset read from a prefetch array
    (deliberately NOT the identity map: program i writes to slot perm[i])."""
    nprog, g, rows = 8, 128, 8

    def kernel(offs_ref, x_hbm, out_hbm, buf, sem, osem):
        i = pl.program_id(0)
        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * g, g)], buf, sem
        ).start()
        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * g, g)], buf, sem
        ).wait()
        buf[:, :] = buf[:, :] + jnp.float32(1.0)
        start = offs_ref[i] * g  # traced, data-dependent offset
        pltpu.make_async_copy(
            buf, out_hbm.at[:, pl.ds(start, g)], osem
        ).start()
        pltpu.make_async_copy(
            buf, out_hbm.at[:, pl.ds(start, g)], osem
        ).wait()

    x = jnp.arange(rows * nprog * g, dtype=jnp.float32).reshape(rows, nprog * g)
    perm = jnp.asarray(np.random.default_rng(0).permutation(nprog), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((rows, g), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, nprog * g), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(perm, x)
    out = np.asarray(out)
    want = np.zeros_like(out)
    xn = np.asarray(x)
    for i in range(nprog):
        d = int(perm[i])
        want[:, d * g:(d + 1) * g] = xn[:, i * g:(i + 1) * g] + 1.0
    ok = np.array_equal(out, want)
    print(f"P1 dynamic-offset HBM write: {'OK' if ok else 'MISMATCH'}")
    return ok


def probe_inreg_permutation():
    """Bucket-grouping permutation as one MXU pass: rows sorted stably by a
    4-bit bucket id computed in-kernel from comparisons + prefix matmul."""
    g = 128

    def kernel(b_ref, x_ref, o_ref):
        bucket = b_ref[0:1, :].astype(jnp.float32)  # (1, g) bucket ids (≤15,
        #   exact in f32 — int relayout transposes miscompile on Mosaic, so
        #   all the comparison algebra runs in f32)
        bi = jnp.broadcast_to(bucket, (g, g))  # bi[i, c] = bucket[c]
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        ).astype(jnp.float32)
        bT = jax.lax.dot_general(  # (g, 1): matmul transpose, Mosaic-safe
            eye, bucket, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bj = jnp.broadcast_to(bT, (g, g))  # bj[i, c] = bucket[i]
        col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        # summing over columns c for each row i: count columns with smaller
        # bucket, plus earlier columns with the same bucket (stable)
        less = (bi < bj).astype(jnp.float32)
        same_before = ((bj == bi) & (col < row)).astype(jnp.float32)
        ones = jnp.ones((g, 1), jnp.float32)
        dst = jax.lax.dot_general(
            less + same_before, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (g, 1) f32: destination lane of row i (kept f32 + sublane-
        #    oriented — the (g,1)→(1,g) reshape is itself a relayout)
        # PT[s, d] = 1 where dst[s] == d — built directly in (g, g) with dst
        # broadcast along lanes, no transposes anywhere
        PT = (
            jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)
            == jnp.broadcast_to(dst, (g, g))
        ).astype(jnp.float32)
        # o[:, d] = sum_s x[:, s] * PT[s, d]. HIGHEST: a permutation apply
        # must not truncate the data to bf16 (the round-4 false "miscompile")
        o_ref[:, :] = jax.lax.dot_general(
            x_ref[:, :], PT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    rng = np.random.default_rng(1)
    buckets = rng.integers(0, 16, g).astype(np.int32)
    x = rng.normal(size=(16, g)).astype(np.float32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, g), jnp.float32),
    )(jnp.asarray(buckets).reshape(1, g), jnp.asarray(x))
    order = np.argsort(buckets, kind="stable")
    ok = np.allclose(np.asarray(out), x[:, order])
    print(f"P2 in-register stable bucket permutation: {'OK' if ok else 'MISMATCH'}")
    return ok


if __name__ == "__main__":
    ok1 = probe_dynamic_write()
    ok2 = probe_inreg_permutation()
    print("bucket-permutation kernel feasible:", ok1 and ok2)
