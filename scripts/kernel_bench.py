"""Raster-kernel timing + TPU-parity spot check.

Times the Pallas fwd/bwd kernels alone at the bench shape and, at a smaller N,
checks pallas-vs-jnp_tile image+gradient agreement on the REAL (Mosaic) path.
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import gaussian_splat_tpu as gs
from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.ops import pallas_raster as pr
from gaussian_splat_tpu.ops.binning import bin_gaussians
from gaussian_splat_tpu.ops.render import _project_and_shade, _effective_opacities, render


def timed(fn, *args, reps=8, iters=5):
    @jax.jit
    def scanned(*a):
        def step(carry, i):
            out = fn(*a, i)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
            return carry + s, None

        total, _ = jax.lax.scan(step, 0.0, jnp.arange(reps, dtype=jnp.float32))
        return total

    jax.block_until_ready(scanned(*args))
    jax.block_until_ready(scanned(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(scanned(*args))
        ts.append((time.perf_counter() - t0) * 1e3 / reps)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    model = gs.GaussianModel.random(
        key, args.n, sh_degree=1, extent=2.0, scale_range=(0.005, 0.02)
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
        60.0, args.width, args.height,
    )
    config = RenderConfig(backend="pallas")
    W, H = args.width, args.height
    n = args.n
    num_tiles = config.num_tiles(W, H)

    proj, colors = jax.jit(lambda m: _project_and_shade(m, camera, config))(model)
    opac = jax.jit(lambda m: _effective_opacities(m, proj, config))(model)
    binning = jax.jit(lambda p: bin_gaussians(p, W, H, config))(proj)
    valid_p = binning.pair_tile < num_tiles
    ranks_keyed = jnp.where(valid_p, binning.pair_gauss, n)
    feats10 = jnp.concatenate(
        [proj.means2d, proj.conics, colors, proj.depths[:, None], opac[:, None]], axis=1)
    pair_feats = jax.jit(
        lambda fr: pr.gather_pairs_t(fr, binning.order, ranks_keyed, binning.rank_starts, False)
    )(feats10)
    static = pr.RasterStatics(
        tile_w=config.tile_width, tile_h=config.tile_height, tiles_x=config.tiles_x(W), tiles_y=config.tiles_y(H),
        chunk=config.chunk_size, alpha_clamp=config.alpha_clamp, alpha_skip=config.alpha_skip,
        sigma_cutoff=config.sigma_cutoff, trans_eps=config.transmittance_eps, interpret=False,
        schunks=config.dma_chunks,
    )
    jax.block_until_ready(pair_feats)

    out = {}
    out["raster_fwd"] = timed(
        lambda pf, i: pr._raster(pf + 1e-9 * i, binning.tile_offsets, binning.tile_counts, static),
        pair_feats,
    )
    print("raster_fwd", round(out["raster_fwd"], 2), flush=True)

    fwd_out = jax.jit(lambda pf: pr._raster_forward(pf, binning.tile_offsets, binning.tile_counts, static))(pair_feats)
    cot = jnp.ones_like(fwd_out)
    jax.block_until_ready(fwd_out)
    out["raster_bwd"] = timed(
        lambda pf, i: pr._raster_backward(pf + 1e-9 * i, binning.tile_offsets, binning.tile_counts, fwd_out, cot, static),
        pair_feats,
    )
    print("raster_bwd", round(out["raster_bwd"], 2), flush=True)

    if not args.skip_parity:
        # TPU-path parity vs jnp_tile at 100k (both share binning/crop semantics)
        np_ = 100_000
        m2 = gs.GaussianModel.random(jax.random.PRNGKey(1), np_, sh_degree=1,
                                     extent=2.0, scale_range=(0.005, 0.03))
        cam2 = gs.Camera.from_lookat((0, 0.5, -5.0), (0, 0, 0), (0, 1, 0), 60.0, 640, 360)
        pal = RenderConfig(backend="pallas")
        jtl = RenderConfig(backend="jnp_tile")
        img_p = jax.jit(lambda m: render(m, cam2, pal).image)(m2)
        img_j = jax.jit(lambda m: render(m, cam2, jtl).image)(m2)
        err = float(jnp.max(jnp.abs(img_p - img_j)))
        out["parity_img_maxerr_100k"] = err
        print("parity img max err:", err, flush=True)

        def loss(m, cfg):
            return jnp.mean(render(m, cam2, cfg).image ** 2)

        g_p = jax.jit(lambda m: jax.grad(loss)(m, pal))(m2)
        g_j = jax.jit(lambda m: jax.grad(loss)(m, jtl))(m2)
        for name in ["means", "opacity_logits", "sh"]:
            a = np.asarray(getattr(g_p, name)).ravel()
            b = np.asarray(getattr(g_j, name)).ravel()
            scale = np.abs(b).max() + 1e-20
            rel = np.abs(a - b).max() / scale
            out[f"parity_grad_{name}_relerr"] = float(rel)
            print(f"parity grad {name} rel err: {rel:.2e}", flush=True)

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v) for k, v in out.items()}))


if __name__ == "__main__":
    main()
