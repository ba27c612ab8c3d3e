"""Sweep tiles_per_program (R) on the trained 200k scene's raster kernels.

The multi-tile batching amortizes per-program fixed cost and (forward) the
first-DMA latency; this sweeps R on the shallow trained scene — where fixed
costs dominate — to pick the default and recalibrate the roofline model's
per-tile constants.

Run: PYTHONPATH=... python scripts/exp_rtiles.py [scenes/fitted.ply]
"""

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "scenes/fitted.ply"
    import gaussian_splat_tpu as gs
    from gaussian_splat_tpu.io.ply import load_gaussians
    from gaussian_splat_tpu.ops import pallas_raster as pr
    from gaussian_splat_tpu.ops.binning import bin_gaussians
    from gaussian_splat_tpu.ops.render import (
        _effective_opacities,
        _project_and_shade,
    )

    model = load_gaussians(path)
    W, H, reps = 1920, 1080, 8
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0, W, H
    )
    base = gs.calibrate_render_config(
        model, camera, gs.RenderConfig(backend="pallas")
    )
    proj, colors = jax.jit(lambda m: _project_and_shade(m, camera, base))(model)
    opac = jax.jit(lambda m: _effective_opacities(m, proj, base))(model)
    binning = jax.jit(
        lambda p, o: bin_gaussians(p, W, H, base, opacities=o)
    )(proj, opac)
    n = model.num_gaussians
    feats10 = jnp.concatenate(
        [proj.means2d, proj.conics, colors, proj.depths[:, None], opac[:, None]],
        axis=1,
    )
    valid_p = binning.pair_tile < base.num_tiles(W, H)
    ranks_keyed = jnp.where(valid_p, binning.pair_gauss, n)
    pair_feats = jax.jit(
        lambda fr: pr.gather_pairs_t(
            fr, binning.order, ranks_keyed, binning.rank_starts, False
        )
    )(feats10)
    jax.block_until_ready(pair_feats)

    def med(fn, fargs, iters=4):
        jax.block_until_ready(fn(*fargs))
        jax.block_until_ready(fn(*fargs))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*fargs))
            ts.append((time.perf_counter() - t0) * 1e3 / reps)
        ts.sort()
        return ts[len(ts) // 2]

    out = {}
    for R in (1, 2, 4, 8):
        cfg = dataclasses.replace(base, tiles_per_program=R)
        static = pr.RasterStatics(
            tile_w=cfg.tile_width, tile_h=cfg.tile_height,
            tiles_x=cfg.tiles_x(W), tiles_y=cfg.tiles_y(H),
            chunk=cfg.chunk_size, alpha_clamp=cfg.alpha_clamp,
            alpha_skip=cfg.alpha_skip, sigma_cutoff=cfg.sigma_cutoff,
            trans_eps=cfg.transmittance_eps, interpret=False,
            schunks=cfg.dma_chunks, rtiles=R,
        )

        @jax.jit
        def run_fwd(pf, static=static):
            def step(c, i):
                o = pr._raster_forward(
                    pf + 1e-9 * i, binning.tile_offsets, binning.tile_counts,
                    static,
                )
                return c + jnp.sum(o[:1, :1]), None

            tot, _ = jax.lax.scan(
                step, 0.0, jnp.arange(reps, dtype=jnp.float32)
            )
            return tot

        fwd_out = pr._raster_forward(
            pair_feats, binning.tile_offsets, binning.tile_counts, static
        )
        cot = jnp.ones_like(fwd_out)
        jax.block_until_ready(fwd_out)

        @jax.jit
        def run_bwd(pf, static=static, fwd_out=fwd_out, cot=cot):
            def step(c, i):
                o = pr._raster_backward(
                    pf + 1e-9 * i, binning.tile_offsets, binning.tile_counts,
                    fwd_out, cot, static,
                )
                return c + jnp.sum(o[:1, :1]).astype(jnp.float32), None

            tot, _ = jax.lax.scan(
                step, 0.0, jnp.arange(reps, dtype=jnp.float32)
            )
            return tot

        f = med(run_fwd, (pair_feats,))
        b = med(run_bwd, (pair_feats,))
        out[f"R{R}"] = {"fwd_ms": round(f, 2), "bwd_ms": round(b, 2)}
        print(f"R={R}: fwd {f:.2f} ms  bwd {b:.2f} ms", flush=True)

    print(json.dumps({"scene": path, "n": n,
                      "num_pairs": int(binning.num_pairs), **out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
