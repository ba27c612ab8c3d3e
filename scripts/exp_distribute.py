"""Probe: Pallas stable bucket-distribution kernel (round-5 binning replacement).

The plan (docs/ARCHITECTURE.md "Next levers" #3) replaces the XLA pair sort
(~21 ms) + B-row pair gather (~32 ms) with a two-level stable distribution:
rank-major pair stream -> 64 coarse buckets -> 64 fine buckets (= tiles),
yielding per-tile depth-ordered, 128-aligned segments. This script probes the
LEVEL-CORE: stream (B, 16) pair-major rows, stable-group each 128-row chunk by
a bucket column (P2 comparison algebra + one HIGHEST one-hot matmul — bit-exact,
see exp_bucket_debug.py), append runs to per-bucket VMEM staging via
dynamic-sublane windows, and flush full 128-row pages to page-aligned HBM
segments with dynamic-offset DMA (P1).

Mechanics under test (all priced by the timing run):
  * dynamic sublane-offset reads/writes on VMEM scratch (traced start)
  * per-chunk scalar extraction of per-bucket counts/starts (VMEM->SMEM DMA)
  * conditional page-flush DMA inside pl.when inside a lax.fori_loop
  * sustained throughput at B = 4M, NB = 64 with random buckets

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_distribute.py

STATUS (round 5, v5e) — NO-GO, kept as the record of why:
  * Mosaic rejects DMA slices whose minor dimension is not tile-aligned:
    a (B, 16) pair-major HBM array cannot be chunk-DMA'd at all
    ("Slice shape along dimension 1 must be aligned to tiling (128), but
    is 16"). Pair rows therefore must travel feature-major (16, B) — but
    then staging appends need dynamic LANE offsets, which Mosaic only
    allows at 128-aligned positions (same tiling rule). Every layout
    either breaks the DMA constraint or forces per-(chunk, bucket)
    register plumbing (roll+select or one-hot matmuls at ~35-800 cycles
    per bucket touch).
  * Cost accounting at the 1080p shape (2.5-4M pairs, 64 buckets,
    rank-major input = random bucket sequence): ~50 of 64 buckets are
    touched per 128-lane chunk, so any per-touch append cost ≥ ~20
    cycles puts a single level at ≥ 40 ms — already slower than the XLA
    sort (3 ns/key) + row gather (7.26 ns/row) it was meant to replace,
    before the second level. Fewer buckets per level lowers per-chunk
    cost linearly but raises the level count the same way.
  The interpret-mode kernel below is correct (stable grouping via the
  bit-exact P2 permutation + paged flushes) and documents the design; the
  round-5 perf work went into shrinking the sort/gather sizes instead
  (ops/binning.py three-tier expansion, RenderConfig.pairs_per_gaussian).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"
NF = 16  # feature columns per pair row
HI = jax.lax.Precision.HIGHEST


def _mm(a, b, dims, prec=HI):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    )


def make_distribute(nb: int, num_chunks: int, out_rows: int):
    """Distribution kernel: pairs (B,16) f32 (bucket id in col 11, already
    clamped to [0, nb); rows >= n_valid carry bucket nb-? no: padding rows
    carry bucket id nb handled by caller as an extra trash bucket) ->
    (out_rows, 16) with stable per-bucket page-aligned segments.

    Scalar-prefetch arg: bases (nb+1,) i32 — page-aligned row offsets per
    bucket (multiples of 128). The kernel maintains per-bucket fill/cursor in
    SMEM scratch and appends via dynamic-sublane staging windows."""

    def kernel(bases_ref, pairs_hbm, out_hbm, staging, inbuf, cntbuf,
               cnt_smem, fill_smem, cur_smem, in_sem, out_sem, cnt_sem):
        # init per-bucket state
        def init_b(b, _):
            fill_smem[b] = 0
            cur_smem[b] = bases_ref[b]
            return 0

        jax.lax.fori_loop(0, nb, init_b, 0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        subl = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        eye = (lane == subl).astype(jnp.float32)
        tri_lt = (subl < lane).astype(jnp.float32)  # strict lower: s' < s
        ones_col = jnp.ones((128, 1), jnp.float32)
        lane_nb = jax.lax.broadcasted_iota(jnp.int32, (128, nb), 1)

        # double-buffered input: chunk i+1 streams while i is processed
        # (pairs_hbm is padded by one chunk so the lookahead stays in bounds)
        pltpu.make_async_copy(
            pairs_hbm.at[pl.ds(0, 128), :], inbuf.at[0], in_sem.at[0]
        ).start()

        def body(i, _):
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds((i + 1) * 128, 128), :],
                inbuf.at[nxt],
                in_sem.at[nxt],
            ).start()
            pltpu.make_async_copy(
                pairs_hbm.at[pl.ds(i * 128, 128), :],
                inbuf.at[slot],
                in_sem.at[slot],
            ).wait()
            chunk = inbuf[slot, :, :]
            bucket = chunk[:, 11:12]  # (128,1) f32, values in [0, nb]

            # ---- stable grouping permutation (P2, sublane-oriented) -----
            # dst[s] = #{s': b[s'] < b[s]} + #{s' < s: b[s'] = b[s]}
            bT = _mm(bucket, eye, ((0,), (0,)))  # (1,128): bucket on lanes
            bi = jnp.broadcast_to(bT, (128, 128))  # bi[s, c] = bucket[c]
            bj = jnp.broadcast_to(bucket, (128, 128))  # bj[s, c] = bucket[s]
            less = (bi < bj).astype(jnp.float32)
            same_before = ((bi == bj) & (lane < subl)).astype(jnp.float32)
            dst = _mm(less + same_before, ones_col, ((1,), (0,)))  # (128,1)
            PT = (
                lane.astype(jnp.float32) == jnp.broadcast_to(dst, (128, 128))
            ).astype(jnp.float32)  # PT[s, d]
            grouped = _mm(PT, chunk, ((0,), (0,)))  # (128, 16) bit-exact
            staging[nb * 256:nb * 256 + 128, :] = grouped
            # rows [128, 256) of the grouped scratch area are never read as
            # real data (window reads beyond a run land past the new fill)

            # ---- per-bucket counts + exclusive starts -> SMEM -----------
            onehot = (
                jnp.broadcast_to(bucket, (128, nb)).astype(jnp.int32)
                == lane_nb
            ).astype(jnp.float32)  # (128, nb)
            ones_row = jnp.ones((1, 128), jnp.float32)
            cnt = _mm(ones_row, onehot, ((1,), (0,)), prec=jax.lax.Precision.DEFAULT)  # (1, nb)
            tri_nb = (
                jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
                < jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
            ).astype(jnp.float32)
            start = _mm(cnt, tri_nb, ((1,), (0,)), prec=jax.lax.Precision.DEFAULT)  # (1, nb)
            cntbuf[0:1, :] = cnt.astype(jnp.int32)
            cntbuf[1:2, :] = start.astype(jnp.int32)
            ccp = pltpu.make_async_copy(cntbuf, cnt_smem, cnt_sem)
            ccp.start()
            ccp.wait()

            # ---- append each bucket's run, flush full pages -------------
            def append_b(b, _):
                c_b = cnt_smem[0, b]
                s_b = cnt_smem[1, b]
                f_b = fill_smem[b]

                @pl.when(c_b > 0)
                def _():
                    run = staging[pl.ds(nb * 256 + s_b, 128), :]
                    staging[pl.ds(b * 256 + f_b, 128), :] = run
                    fill_smem[b] = f_b + c_b

                f2 = fill_smem[b]

                @pl.when(f2 >= 128)
                def _():
                    cur = cur_smem[b]
                    fcp = pltpu.make_async_copy(
                        staging.at[pl.ds(b * 256, 128), :],
                        out_hbm.at[pl.ds(cur, 128), :],
                        out_sem,
                    )
                    fcp.start()
                    fcp.wait()
                    staging[pl.ds(b * 256, 128), :] = staging[
                        pl.ds(b * 256 + 128, 128), :
                    ]
                    cur_smem[b] = cur + 128
                    fill_smem[b] = f2 - 128

                return 0

            jax.lax.fori_loop(0, nb, append_b, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)

        # ---- final partial flush (garbage tails land in segment padding) ---
        def final_b(b, _):
            @pl.when(fill_smem[b] > 0)
            def _():
                fcp = pltpu.make_async_copy(
                    staging.at[pl.ds(b * 256, 128), :],
                    out_hbm.at[pl.ds(cur_smem[b], 128), :],
                    out_sem,
                )
                fcp.start()
                fcp.wait()

            return 0

        jax.lax.fori_loop(0, nb, final_b, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM(((nb + 1) * 256, NF), jnp.float32),  # staging+grouped
            pltpu.VMEM((2, 128, NF), jnp.float32),  # double-buffered input
            pltpu.VMEM((2, nb), jnp.int32),  # cnt/start rows
            pltpu.SMEM((2, nb), jnp.int32),  # cnt/start scalars
            pltpu.SMEM((nb,), jnp.int32),  # fills
            pltpu.SMEM((nb,), jnp.int32),  # cursors
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, NF), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )


def ref_distribute(pairs, nb, bases, out_rows):
    """numpy oracle: stable distribution into page-aligned segments."""
    out = np.zeros((out_rows, NF), np.float32)
    cur = bases[:nb].copy()
    for row in pairs:
        b = int(row[11])
        if b >= nb:
            continue
        out[cur[b]] = row
        cur[b] += 1
    return out, cur


def run_case(B, nb, seed=0, timeit=False):
    rng = np.random.default_rng(seed)
    pairs = rng.normal(size=(B, NF)).astype(np.float32)
    pairs[:, 11] = rng.integers(0, nb, B)  # worst case: random buckets
    counts = np.bincount(pairs[:, 11].astype(np.int64), minlength=nb)
    pages = -(-counts // 128)
    bases = np.zeros(nb + 1, np.int32)
    bases[1:] = np.cumsum(pages * 128)
    out_rows = int(bases[nb])
    num_chunks = B // 128

    # pad input by one chunk for the double-buffer lookahead
    pairs_in = np.concatenate(
        [pairs, np.zeros((128, NF), np.float32)], axis=0
    )
    fn = make_distribute(nb, num_chunks, out_rows)
    fn = jax.jit(fn)
    out = np.asarray(fn(jnp.asarray(bases), jnp.asarray(pairs_in)))

    want, fcur = ref_distribute(pairs, nb, bases, out_rows)
    # compare only valid rows per segment (padding tails are garbage)
    ok = True
    for b in range(nb):
        lo, c = bases[b], counts[b]
        if not np.array_equal(out[lo:lo + c], want[lo:lo + c]):
            ok = False
            bad = np.nonzero(
                ~(out[lo:lo + c] == want[lo:lo + c]).all(axis=1)
            )[0]
            print(f"  bucket {b}: {len(bad)} bad rows, first {bad[:5]}")
            break
    print(f"distribute B={B} nb={nb}: {'OK' if ok else 'MISMATCH'}")

    if timeit and ok:
        jb = jnp.asarray(bases)
        jp = jnp.asarray(pairs_in)
        fn(jb, jp).block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            fn(jb, jp).block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(
            f"  {dt * 1e3:.2f} ms ({dt / B * 1e9:.2f} ns/pair, "
            f"{B * NF * 4 * 2 / dt / 1e9:.0f} GB/s rw)"
        )
    return ok


if __name__ == "__main__":
    run_case(128 * 40, 64)  # correctness, small
    run_case(128 * 40, 8)  # correctness, few buckets (long runs)
    if not INTERPRET:
        run_case(1 << 22, 64, timeit=True)  # 4M pairs, the 1080p shape
