"""Probe: dense-key expansion kernel (the next binning-sort lever).

The padded pair expansion sorts ~2.3x more entries than there are real
pairs (K-block padding: 7M for 2.46M at 1M/1080p — packed-u32 sort ~10.5
ms; a real-size sort would be ~4 ms). A Pallas kernel can emit the keys
DENSELY because the rank-major pair stream has the window property: 128
consecutive pair indices touch <= 128 consecutive ranks (guaranteed when
every valid rank emits >= 1 pair), so per 128-pair chunk everything is
rank-window algebra:

  r[pair]    = #(rank_starts[w] <= pair) - 1 over a 384-wide aligned window
               -> one 0/1 (128,384)@(384,1) matmul (exact at DEFAULT)
  starts[r], code[r] via one-hot row-weighted sums (O * row) @ ones
               -> exact with 16-bit hi/lo splits (values exceed bf16)
  cell = pair - starts[r]; tile from the rect code; key = tile<<rb | r

This script validates the full algebra against numpy on hardware and
times it at the bench shape.

STATUS (round 5, v5e): CORRECT on hardware at 1M ranks / 3M pairs, but
**45 ns/pair** — an order of magnitude too slow to pay off. The cost is
the per-chunk matvec algebra itself, not program overhead (single-chunk
grid 49.9 ns/pair; 64-chunk programs with double-buffered window DMAs and
a pipelined output path, below, 45.5): five (128,384)@(384,1) HIGHEST
matvecs + two 128x128 transposes per 128 pairs keep the MXU at 1-wide
free dims and 6x precision passes. The best known restructuring — stack
the gather targets as one (384, 8) RHS of 8-bit splits (integers <= 255
are bf16-exact, so DEFAULT-precision single passes suffice) — projects to
~7 MXU passes/chunk ≈ 8-12 ns/pair, still WORSE than the 10.5 ms padded
packed-u32 sort it would replace (3.4 ns per padded entry; the dense sort
would save only ~6.5 ms). VERDICT: the dense-expansion lever is measured
OUT at this geometry, like the bucket distribution (exp_distribute.py) —
XLA's regular-access sort remains the cheapest router on TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_dense_expand.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() != "tpu"
HI = jax.lax.Precision.HIGHEST
W_WIN = 384  # aligned rank window per chunk (>= 128 span + 128 align slack +
#   headroom); rank_lo is rounded down to a 128 multiple for the DMA



def make_expand(num_chunks: int, n: int):
    """Returns pallas_call emitting (num_chunks, 128) u32 packed keys.

    Inputs (all HBM, minor dim padded/aligned):
      rank_lo128 (num_chunks+1,) i32 prefetch: 128-aligned window base/chunk
      starts2    (2, n_pad) f32: rank_starts as hi/lo 16-bit halves
      codes2     (2, n_pad) f32: per-rank rect code as hi/lo 16-bit halves
    Output keys: tile<<20 | rank, 0xFFFFFFFF on padding rows.

    Grid programs each process `cpp` chunks with double-buffered window
    DMAs and a 2-slot deferred-wait output pipeline.
    """
    cpp = 64  # chunks per program
    nprog = -(-num_chunks // cpp)

    def emit(sbuf, cbuf, obuf, slot, c):
        """Key algebra for one 128-pair chunk (windows already in VMEM)."""
        lo = pl.multiple_of(c * 0 + 0, 128)  # unused; kept for clarity
        starts_row = sbuf[slot, 0:1, :] * 65536.0 + sbuf[slot, 1:2, :]
        p_col = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) + c * 128
        ).astype(jnp.float32)
        cmp = (
            jnp.broadcast_to(starts_row, (128, W_WIN))
            <= jnp.broadcast_to(p_col, (128, W_WIN))
        ).astype(jnp.float32)
        ones_col = jnp.ones((W_WIN, 1), jnp.float32)
        rcnt = jax.lax.dot_general(
            cmp, ones_col, ((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r_rel = rcnt - 1.0
        win = jax.lax.broadcasted_iota(jnp.int32, (128, W_WIN), 1).astype(
            jnp.float32
        )
        onehot = (win == jnp.broadcast_to(r_rel, (128, W_WIN))).astype(
            jnp.float32
        )

        def sel(row):
            return jax.lax.dot_general(
                onehot * jnp.broadcast_to(row, (128, W_WIN)), ones_col,
                ((((1,), (0,))), ((), ())),
                preferred_element_type=jnp.float32, precision=HI,
            )

        start_sel = sel(sbuf[slot, 0:1, :]) * 65536.0 + sel(
            sbuf[slot, 1:2, :]
        )
        code_sel = (
            sel(cbuf[slot, 0:1, :]).astype(jnp.int32) * 65536
            + sel(cbuf[slot, 1:2, :]).astype(jnp.int32)
        )
        cell = (p_col - start_sel).astype(jnp.int32)
        return r_rel, cell, code_sel

    def kernel(lo_ref, starts2_hbm, codes2_hbm, out_ref, sbuf, cbuf, sem1,
               sem2, osem, obuf):
        prog = pl.program_id(0)
        c0 = prog * cpp
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ).astype(jnp.float32)

        def dma_in(slot, c):
            lo = pl.multiple_of(lo_ref[c], 128)
            return (
                pltpu.make_async_copy(
                    starts2_hbm.at[:, pl.ds(lo, W_WIN)], sbuf.at[slot],
                    sem1.at[slot],
                ),
                pltpu.make_async_copy(
                    codes2_hbm.at[:, pl.ds(lo, W_WIN)], cbuf.at[slot],
                    sem2.at[slot],
                ),
            )

        def dma_out(slot, c):
            return pltpu.make_async_copy(
                obuf.at[slot], out_ref.at[pl.ds(c, 1), :], osem.at[slot]
            )

        for a in dma_in(0, c0):
            a.start()

        def body(i, _):
            c = c0 + i
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < cpp)
            def _():
                for a in dma_in(nxt, c + 1):
                    a.start()

            for a in dma_in(slot, c):
                a.wait()

            @pl.when(i >= 2)
            def _():
                dma_out(slot, c - 2).wait()

            r_rel, cell, code_sel = emit(sbuf, cbuf, obuf, slot, c)
            lo = lo_ref[c]
            r_glob = r_rel.astype(jnp.int32) + lo
            tx0 = code_sel & 0x7F
            ty0 = (code_sel >> 7) & 0x1FF
            wr = jnp.maximum((code_sel >> 16) & 0x3F, 1)
            area = (code_sel >> 22) & 0x3F
            tile = (ty0 + cell // wr) * 60 + (tx0 + cell % wr)
            valid = (cell >= 0) & (cell < area) & (r_glob < n)
            key = jnp.where(
                valid,
                (tile.astype(jnp.uint32) << 20) | r_glob.astype(jnp.uint32),
                jnp.uint32(0xFFFFFFFF),
            )
            # transpose to lanes via 16-bit-split eye matmuls (u32 exceeds
            # f32-exact range; u32<->f32 casts route through i32 for Mosaic)
            hi = (key >> 16).astype(jnp.int32).astype(jnp.float32)
            lo16 = (
                key & jnp.uint32(0xFFFF)
            ).astype(jnp.int32).astype(jnp.float32)

            def t16(col):
                return jax.lax.dot_general(
                    col, eye, ((((0,), (0,))), ((), ())),
                    preferred_element_type=jnp.float32, precision=HI,
                )

            keyT = (
                t16(hi).astype(jnp.int32).astype(jnp.uint32) << 16
            ) | t16(lo16).astype(jnp.int32).astype(jnp.uint32)
            obuf[slot, 0:1, :] = keyT
            dma_out(slot, c).start()
            return 0

        jax.lax.fori_loop(0, cpp, body, 0)
        for w in (1, 2):  # drain the last two output DMAs

            @pl.when(cpp >= w)
            def _(w=w):
                i = cpp - w
                dma_out(jax.lax.rem(i, 2), c0 + i).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, W_WIN), jnp.float32),
            pltpu.VMEM((2, 2, W_WIN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, 1, 128), jnp.uint32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nprog * cpp, 128), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )


def run(n, seed=0, timeit=False):
    rng = np.random.default_rng(seed)
    # synthetic per-rank rects: areas 1..6 (every rank emits >= 1 pair — the
    # window-property invariant the production path enforces)
    wr = rng.integers(1, 4, n)
    hr = rng.integers(1, 3, n)
    area = wr * hr
    tx0 = rng.integers(0, 60 - 3, n)
    ty0 = rng.integers(0, 68 - 2, n)
    code = tx0 | (ty0 << 7) | (wr << 16) | (area << 22)
    starts = np.zeros(n + 1, np.int64)
    starts[1:] = np.cumsum(area)
    B = int(starts[-1])
    num_chunks = -(-B // 128)

    # numpy ground truth
    want = np.full(num_chunks * 128, 0xFFFFFFFF, np.uint32)
    p = np.arange(B)
    r = np.searchsorted(starts, p, side="right") - 1
    cell = p - starts[r]
    tile = (ty0[r] + cell // wr[r]) * 60 + (tx0[r] + cell % wr[r])
    want[:B] = (tile.astype(np.uint32) << 20) | r.astype(np.uint32)

    # inputs
    n_pad = -(-(n + 1) // 128) * 128 + W_WIN
    s32 = starts.astype(np.uint32)
    starts2 = np.zeros((2, n_pad), np.float32)
    starts2[0, : n + 1] = (s32 >> 16).astype(np.float32)
    starts2[1, : n + 1] = (s32 & 0xFFFF).astype(np.float32)
    starts2[0, n + 1 :] = 65535.0  # +inf-ish sentinel: never <= p
    starts2[1, n + 1 :] = 65535.0
    codes2 = np.zeros((2, n_pad), np.float32)
    codes2[0, :n] = (code >> 16).astype(np.float32)
    codes2[1, :n] = (code & 0xFFFF).astype(np.float32)
    cpp = 64
    nprog = -(-num_chunks // cpp)
    nc_pad = nprog * cpp
    rank_lo = np.maximum(np.searchsorted(starts, np.arange(nc_pad + 1) * 128,
                                         side="right") - 1, 0)
    rank_lo128 = np.minimum((rank_lo // 128) * 128, n_pad - W_WIN)
    # window-coverage invariant: every chunk's rank span fits the window
    span = (np.searchsorted(starts, np.minimum(np.arange(1, num_chunks + 1)
                                               * 128, B) - 1,
                            side="right") - 1 - rank_lo128[:num_chunks])
    assert span.max() < W_WIN, span.max()

    fn = jax.jit(make_expand(num_chunks, n))
    out = np.asarray(
        fn(jnp.asarray(rank_lo128.astype(np.int32)), jnp.asarray(starts2),
           jnp.asarray(codes2))
    ).reshape(-1)[: num_chunks * 128]
    ok = np.array_equal(out, want)
    print(f"dense expand n={n} B={B}: {'OK' if ok else 'MISMATCH'}")
    if not ok:
        bad = np.nonzero(out != want)[0]
        print("  bad:", bad[:8], [hex(x) for x in out[bad[:4]]],
              [hex(x) for x in want[bad[:4]]])
    if timeit and ok:
        args = (jnp.asarray(rank_lo128.astype(np.int32)),
                jnp.asarray(starts2), jnp.asarray(codes2))
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            jax.block_until_ready(fn(*args))
        dt = (time.perf_counter() - t0) / reps
        print(f"  {dt*1e3:.2f} ms  ({dt/B*1e9:.2f} ns/pair)")
    return ok


if __name__ == "__main__":
    run(2000)
    if not INTERPRET:
        run(1_000_000, timeit=True)
