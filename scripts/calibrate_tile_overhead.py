"""Calibrate the per-program fixed cost of the raster kernels.

Times the fwd/bwd Pallas kernels with ALL tile counts zero (no DMAs, no chunk
loop — just program prologue, scalar reads, accumulator init, output
transpose/DMA) across several grid sizes; the slope of time vs num_tiles is
the per-tile floor used by utils/roofline.py (FWD_TILE_US / BWD_TILE_US).

Run: python scripts/calibrate_tile_overhead.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.ops import pallas_raster as pr

REPS = 16


def time_kernels(num_tiles_y, config):
    W = config.tile_width * 32
    H = config.tile_height * num_tiles_y
    static = pr.RasterStatics(
        tile_w=config.tile_width, tile_h=config.tile_height,
        tiles_x=32, tiles_y=num_tiles_y,
        chunk=config.chunk_size, alpha_clamp=config.alpha_clamp,
        alpha_skip=config.alpha_skip, sigma_cutoff=config.sigma_cutoff,
        trans_eps=config.transmittance_eps, interpret=False,
        schunks=config.dma_chunks,
        rtiles=max(1, config.tiles_per_program),  # calibrate what ships
    )
    T = 32 * num_tiles_y
    npix = config.tile_width * config.tile_height
    b = config.chunk_size * (config.dma_chunks + 2)
    pair_feats = jnp.zeros((pr.NFEAT, b), jnp.float32)
    offsets = jnp.zeros((T,), jnp.int32)
    counts = jnp.zeros((T,), jnp.int32)

    @jax.jit
    def run_fwd(pf):
        def step(c, i):
            o = pr._raster_forward(pf + 1e-9 * i, offsets, counts, static)
            return c + o[0, 0], None

        tot, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return tot

    fwd_out = pr._raster_forward(pair_feats, offsets, counts, static)
    cot = jnp.ones_like(fwd_out)

    @jax.jit
    def run_bwd(pf):
        def step(c, i):
            o = pr._raster_backward(
                pf + 1e-9 * i, offsets, counts, fwd_out, cot, static
            )
            return c + jnp.sum(o[:1, :1]).astype(jnp.float32), None

        tot, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS, dtype=jnp.float32))
        return tot

    def med(fn):
        jax.block_until_ready(fn(pair_feats))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(pair_feats))
            ts.append((time.perf_counter() - t0) * 1e3 / REPS)
        ts.sort()
        return ts[len(ts) // 2]

    return T, med(run_fwd), med(run_bwd)


def main():
    config = RenderConfig()
    rows = []
    for ty in [8, 32, 128]:
        T, f_ms, b_ms = time_kernels(ty, config)
        rows.append((T, f_ms, b_ms))
        print(f"T={T:5d} tiles: fwd {f_ms:7.3f} ms  bwd {b_ms:7.3f} ms")
    (t0, f0, b0), (t1, f1, b1) = rows[0], rows[-1]
    print(
        f"slope: fwd {(f1 - f0) / (t1 - t0) * 1e3:.2f} us/tile, "
        f"bwd {(b1 - b0) / (t1 - t0) * 1e3:.2f} us/tile"
    )


if __name__ == "__main__":
    main()
