"""Per-stage wall-clock breakdown of the pallas render pipeline on the bench scene.

Each stage is jitted separately and scan-amortized over --reps iterations to
subtract the fixed per-dispatch tunnel overhead (~30 ms in this environment).
Inputs to later stages are materialized from earlier ones so stage timings are
isolated. Prints a JSON dict of stage → ms.
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

import gaussian_splat_tpu as gs
from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.ops import pallas_raster as pr
from gaussian_splat_tpu.ops.binning import bin_gaussians
from gaussian_splat_tpu.ops.render import _project_and_shade, _effective_opacities


def timed(fn, *args, reps=8, iters=5):
    """Median ms/call of fn(*args), amortized over a scan of `reps`."""

    @jax.jit
    def scanned(*a):
        def step(carry, i):
            out = fn(*a, jiggle=i)
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l[..., :1].astype(jnp.float32)) if l.ndim else l.astype(jnp.float32) for l in leaves)
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
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sh-degree", type=int, default=1)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    model = gs.GaussianModel.random(
        key, args.n, sh_degree=args.sh_degree, extent=2.0, scale_range=(0.005, 0.02)
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
        60.0, args.width, args.height,
    )
    config = RenderConfig(backend="pallas")
    W, H = args.width, args.height
    num_tiles = config.num_tiles(W, H)
    n = args.n

    out = {}

    # --- stage inputs (materialized once) -----------------------------------
    proj, colors = jax.jit(lambda m: _project_and_shade(m, camera, config))(model)
    opac = jax.jit(lambda m: _effective_opacities(m, proj, config))(model)
    binning = jax.jit(
        lambda p: bin_gaussians(p, W, H, config), static_argnums=()
    )(proj)
    jax.block_until_ready((proj, colors, opac, binning))
    print("num_pairs:", int(binning.num_pairs), "overflow:", int(binning.overflow),
          "budget:", binning.pair_tile.shape[0], "clamped:", int(binning.clamped_rects))

    # 1. projection + SH
    def f_proj(m, jiggle):
        mi = m.replace(means=m.means + 1e-6 * jiggle)
        return _project_and_shade(mi, camera, config)

    out["projection+sh"] = timed(f_proj, model, reps=args.reps); print("STAGE", "projection+sh", round(out["projection+sh"],2), flush=True)

    # 2. binning total
    def f_bin(p, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        return bin_gaussians(pi, W, H, config)

    out["binning_total"] = timed(f_bin, proj, reps=args.reps); print("STAGE", "binning_total", round(out["binning_total"],2), flush=True)

    # 2a. binning: depth argsort alone
    def f_argsort(p, jiggle):
        dk = jnp.where(p.valid, p.depths + 1e-6 * jiggle, jnp.inf)
        return jnp.argsort(dk)

    out["binning_argsort_n"] = timed(f_argsort, proj, reps=args.reps); print("STAGE", "binning_argsort_n", round(out["binning_argsort_n"],2), flush=True)

    # 2b. the pair sort alone (reconstruct expansion inputs once, time the sort)
    from gaussian_splat_tpu.ops.binning import effective_rects
    order = binning.order
    means2d_s = proj.means2d[order]
    radii_s = proj.radii[order]
    valid_s = proj.valid[order]
    tx0, ty0, w_r, h_r, is_big, big_idx, _, _ = jax.jit(
        lambda m, r, v: effective_rects(m, r, v, W, H, config)
    )(means2d_s, radii_s, valid_s)

    def f_pairsort(keys, gauss, jiggle):
        k = keys + (jiggle * 0).astype(keys.dtype)
        return jax.lax.sort((k, gauss), dimension=0, is_stable=True, num_keys=2)

    # build flat keys the way bin_gaussians does
    tx_n = config.tiles_x(W)
    area = w_r * h_r
    k_small = config.small_tiles_per_gaussian
    K = config.max_tiles_per_gaussian
    budget = config.pair_budget(n)
    starts_all = jnp.cumsum(area) - area
    fits = starts_all + area <= budget
    eff_area = jnp.where(fits, area, 0)

    def expand(tx0e, ty0e, we, areae, gausse, kk):
        kidx = jnp.arange(kk, dtype=jnp.int32)[None, :]
        w_safe = jnp.maximum(we, 1)[:, None]
        tile = (ty0e[:, None] + kidx // w_safe) * tx_n + (tx0e[:, None] + kidx % w_safe)
        ok = kidx < areae[:, None]
        keys = jnp.where(ok, tile, num_tiles).astype(jnp.int32)
        gauss = jnp.broadcast_to(gausse[:, None], keys.shape)
        return keys.reshape(-1), gauss.reshape(-1)

    area_small = jnp.where(is_big, 0, eff_area)
    ks, gs_ = expand(tx0, ty0, w_r, area_small, jnp.arange(n, dtype=jnp.int32), k_small)
    kb, gb = expand(tx0[big_idx], ty0[big_idx], w_r[big_idx], eff_area[big_idx], big_idx, K)
    flat_keys = jnp.concatenate([ks, kb])
    flat_gauss = jnp.concatenate([gs_, gb])
    jax.block_until_ready((flat_keys, flat_gauss))
    print("padded sort size:", flat_keys.shape[0])
    out["binning_pairsort_only"] = timed(f_pairsort, flat_keys, flat_gauss, reps=args.reps); print("STAGE", "binning_pairsort_only", round(out["binning_pairsort_only"],2), flush=True)

    # 2c. searchsorted boundaries
    sorted_keys = binning.pair_tile

    def f_bounds(sk, jiggle):
        k = sk + (jiggle * 0).astype(sk.dtype)
        return jnp.searchsorted(k, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left")

    out["binning_searchsorted"] = timed(f_bounds, sorted_keys, reps=args.reps); print("STAGE", "binning_searchsorted", round(out["binning_searchsorted"],2), flush=True)

    # 3. pair gather fwd
    valid_p = binning.pair_tile < num_tiles
    ranks_keyed = jnp.where(valid_p, binning.pair_gauss, n)
    feats_rows = jnp.concatenate(
        [proj.means2d, proj.conics, colors, proj.depths[:, None], opac[:, None]], axis=1)

    def f_gather(fr, jiggle):
        fri = fr + 1e-6 * jiggle
        return pr.gather_pairs_t(fri, binning.order, ranks_keyed, binning.rank_starts, False)

    out["pair_gather_fwd"] = timed(f_gather, feats_rows, reps=args.reps); print("STAGE", "pair_gather_fwd", round(out["pair_gather_fwd"],2), flush=True)

    # 4. raster fwd kernel alone
    pair_feats = jax.jit(
        lambda fr: pr.gather_pairs_t(fr, binning.order, ranks_keyed, binning.rank_starts, False)
    )(feats_rows)
    static = pr.RasterStatics(
        tile_w=config.tile_width, tile_h=config.tile_height, tiles_x=config.tiles_x(W), tiles_y=config.tiles_y(H),
        chunk=config.chunk_size, alpha_clamp=config.alpha_clamp, alpha_skip=config.alpha_skip,
        sigma_cutoff=config.sigma_cutoff, trans_eps=config.transmittance_eps, interpret=False,
        schunks=config.dma_chunks,
    )
    jax.block_until_ready(pair_feats)

    def f_raster(pf, jiggle):
        pfi = pf + 1e-9 * jiggle
        return pr._raster(pfi, binning.tile_offsets, binning.tile_counts, static)

    out["raster_fwd_kernel"] = timed(f_raster, pair_feats, reps=args.reps); print("STAGE", "raster_fwd_kernel", round(out["raster_fwd_kernel"],2), flush=True)

    # 4b. end-to-end forward render (accounts for assembly/overheads not in 1-4)
    def f_full_fwd(m, jiggle):
        mi = m.replace(means=m.means + 1e-6 * jiggle)
        return gs.render(mi, camera, config).image

    out["full_fwd"] = timed(f_full_fwd, model, reps=args.reps); print("STAGE", "full_fwd", round(out["full_fwd"],2), flush=True)

    # 4c. feats10 build (concat + ranks_keyed where)
    def f_feats_build(p, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        vp = binning.pair_tile < num_tiles
        rk = jnp.where(vp, binning.pair_gauss, n)
        fr = jnp.concatenate(
            [pi.means2d, pi.conics, colors, pi.depths[:, None], opac[:, None]],
            axis=1,
        )
        return fr, rk

    out["feats10_build"] = timed(f_feats_build, proj, reps=args.reps); print("STAGE", "feats10_build", round(out["feats10_build"],2), flush=True)

    # 4d. post-kernel tile assembly (reshape/swap/tiles_to_image/background)
    tiles_flat = jax.jit(lambda pf: pr._raster(pf, binning.tile_offsets, binning.tile_counts, static))(pair_feats)
    jax.block_until_ready(tiles_flat)
    from gaussian_splat_tpu.ops.tile_raster import tiles_to_image
    tx_nn, ty_nn = config.tiles_x(W), config.tiles_y(H)
    tw, th = config.tile_width, config.tile_height

    def f_assembly(tf, jiggle):
        tfi = tf + 1e-9 * jiggle
        tiles = tfi.reshape(num_tiles, pr.NROW, tw * th)
        rgbd_t = jnp.swapaxes(tiles[:, 0:4, :], 1, 2)
        tft = tiles[:, 4, :]
        rgbd = tiles_to_image(rgbd_t, tx_nn, ty_nn, W, H, tw, th)
        t_final = tiles_to_image(tft[..., None], tx_nn, ty_nn, W, H, tw, th)[..., 0]
        bg = jnp.asarray(config.background, jnp.float32)
        return rgbd[..., :3] + t_final[..., None] * bg, t_final, rgbd[..., 3]

    out["assembly"] = timed(f_assembly, tiles_flat, reps=args.reps); print("STAGE", "assembly", round(out["assembly"],2), flush=True)

    # 5. raster bwd kernel alone
    fwd_out = jax.jit(lambda pf: pr._raster_forward(pf, binning.tile_offsets, binning.tile_counts, static))(pair_feats)
    cot = jnp.ones_like(fwd_out)
    jax.block_until_ready(fwd_out)

    def f_raster_bwd(pf, jiggle):
        pfi = pf + 1e-9 * jiggle
        return pr._raster_backward(pfi, binning.tile_offsets, binning.tile_counts, fwd_out, cot, static)

    out["raster_bwd_kernel"] = timed(f_raster_bwd, pair_feats, reps=args.reps); print("STAGE", "raster_bwd_kernel", round(out["raster_bwd_kernel"],2), flush=True)

    # 6. gather VJP alone
    d_pairs = jnp.ones((pr.NFEAT, binning.pair_tile.shape[0]), jnp.float32)

    def f_gather_vjp(dp, jiggle):
        dpi = dp + 1e-9 * jiggle
        res = (binning.order, ranks_keyed, binning.rank_starts, n)
        return pr._gather_pairs_t_bwd(False, res, dpi)[0]

    out["gather_vjp"] = timed(f_gather_vjp, d_pairs, reps=args.reps); print("STAGE", "gather_vjp", round(out["gather_vjp"],2), flush=True)

    # 6a. gather VJP: rank sort alone
    def f_rank_sort(rk, jiggle):
        k = rk + (jiggle * 0).astype(rk.dtype)
        b = rk.shape[0]
        return jax.lax.sort((k, jnp.arange(b, dtype=jnp.int32)), num_keys=1)

    out["gather_vjp_ranksort"] = timed(f_rank_sort, ranks_keyed, reps=args.reps); print("STAGE", "gather_vjp_ranksort", round(out["gather_vjp_ranksort"],2), flush=True)

    # 6b. gather VJP: perm gather alone
    _, perm = jax.lax.sort((ranks_keyed, jnp.arange(ranks_keyed.shape[0], dtype=jnp.int32)), num_keys=1)
    jax.block_until_ready(perm)

    def f_permgather(dp, jiggle):
        dpi = dp + 1e-9 * jiggle
        return jnp.take(dpi[: pr.NCOLS_LIVE, :], perm, axis=1)

    out["gather_vjp_permgather"] = timed(f_permgather, d_pairs, reps=args.reps); print("STAGE", "gather_vjp_permgather", round(out["gather_vjp_permgather"],2), flush=True)

    # 6c. multi-operand sort alternative: sort (rank, 10 cols) in one sort
    def f_multisort(dp, jiggle):
        dpi = dp + 1e-9 * jiggle
        ops = (ranks_keyed,) + tuple(dpi[i, :] for i in range(pr.NCOLS_LIVE))
        return jax.lax.sort(ops, num_keys=1)

    out["alt_multiop_sort11"] = timed(f_multisort, d_pairs, reps=args.reps); print("STAGE", "alt_multiop_sort11", round(out["alt_multiop_sort11"],2), flush=True)

    # 6d. cumsum + boundary diff alone
    ds_sorted = jnp.take(d_pairs[: pr.NCOLS_LIVE, :], perm, axis=1).T
    jax.block_until_ready(ds_sorted)

    def f_cumsum(ds, jiggle):
        dsi = ds + 1e-9 * jiggle
        cs = jnp.concatenate([jnp.zeros((1, pr.NCOLS_LIVE), ds.dtype), jnp.cumsum(dsi, axis=0)], axis=0)
        return cs[binning.rank_starts[1:]] - cs[binning.rank_starts[:-1]]

    out["gather_vjp_cumsum"] = timed(f_cumsum, ds_sorted, reps=args.reps); print("STAGE", "gather_vjp_cumsum", round(out["gather_vjp_cumsum"],2), flush=True)

    # 7. single-key packed u32 sort alternative for binning (13b tile | 20b rank)
    packed = (flat_keys.astype(jnp.uint32) << 20) | jnp.minimum(
        flat_gauss, (1 << 20) - 1
    ).astype(jnp.uint32)
    jax.block_until_ready(packed)

    def f_packsort(pk, jiggle):
        k = pk + (jiggle * 0).astype(pk.dtype)
        return jax.lax.sort((k,), dimension=0, is_stable=False, num_keys=1)

    out["alt_packed_u32_sort"] = timed(f_packsort, packed, reps=args.reps); print("STAGE", "alt_packed_u32_sort", round(out["alt_packed_u32_sort"],2), flush=True)

    # 7b. packed sort at the truncated budget size (what a leaner expansion would sort)
    packed_b = packed[: binning.pair_tile.shape[0]]

    def f_packsort_b(pk, jiggle):
        k = pk + (jiggle * 0).astype(pk.dtype)
        return jax.lax.sort((k,), dimension=0, is_stable=False, num_keys=1)

    out["alt_packed_u32_sort_budget"] = timed(f_packsort_b, packed_b, reps=args.reps); print("STAGE", "alt_packed_u32_sort_budget", round(out["alt_packed_u32_sort_budget"],2), flush=True)

    # 7c. one-gather pipeline stages (the SHIPPED path in render_tiled_pallas)
    from gaussian_splat_tpu.ops.binning import rect_codes
    from gaussian_splat_tpu.ops.pallas_raster import (
        take_rows,
        raster_pairs_sorted,
        _raster_pairs_sorted_bwd,
        RasterStatics as _RS,
    )

    code, clamped, _tier_ovf = jax.jit(
        lambda p: rect_codes(p, W, H, config)
    )(proj)
    codef = jax.lax.bitcast_convert_type(code, jnp.float32)
    combined = jnp.concatenate([feats_rows, codef[:, None]], axis=1)
    jax.block_until_ready(combined)

    def f_take_rows(c, jiggle):
        return take_rows(c + 1e-9 * jiggle, binning.order)

    out["og_table_gather"] = timed(f_take_rows, combined, reps=args.reps); print("STAGE", "og_table_gather", round(out["og_table_gather"],2), flush=True)

    def f_take_rows_vjp(c, jiggle):
        _, vjp = jax.vjp(lambda x: take_rows(x, binning.order), c + 1e-9 * jiggle)
        return vjp(jnp.ones_like(c))

    out["og_table_gather_fwd_bwd"] = timed(f_take_rows_vjp, combined, reps=args.reps); print("STAGE", "og_table_gather_fwd_bwd", round(out["og_table_gather_fwd_bwd"],2), flush=True)

    table_all = take_rows(combined, binning.order)
    table10 = table_all[:, :10]
    jax.block_until_ready(table10)

    def f_rps_fwd(t, jiggle):
        return raster_pairs_sorted(
            t + 1e-9 * jiggle, ranks_keyed, binning.rank_starts,
            binning.tile_offsets, binning.tile_counts, static,
        )

    out["og_raster_sorted_fwd"] = timed(f_rps_fwd, table10, reps=args.reps); print("STAGE", "og_raster_sorted_fwd", round(out["og_raster_sorted_fwd"],2), flush=True)

    def f_rps_fwd_bwd(t, jiggle):
        _, vjp = jax.vjp(
            lambda x: raster_pairs_sorted(
                x, ranks_keyed, binning.rank_starts,
                binning.tile_offsets, binning.tile_counts, static,
            ),
            t + 1e-9 * jiggle,
        )
        return vjp(fwd_out_ones)

    fwd_out_ones = jnp.ones_like(f_rps_fwd(table10, jnp.float32(0)))
    out["og_raster_sorted_fwd_bwd"] = timed(f_rps_fwd_bwd, table10, reps=args.reps); print("STAGE", "og_raster_sorted_fwd_bwd", round(out["og_raster_sorted_fwd_bwd"],2), flush=True)

    # 8. full pipeline for cross-check
    def f_full(m, jiggle):
        mi = m.replace(means=m.means + 1e-6 * jiggle)
        return gs.render(mi, camera, config).image

    out["full_fwd"] = timed(f_full, model, reps=args.reps); print("STAGE", "full_fwd", round(out["full_fwd"],2), flush=True)

    def loss(m):
        return jnp.mean(gs.render(m, camera, config).image ** 2)

    def f_fullbwd(m, jiggle):
        mi = m.replace(means=m.means + 1e-6 * jiggle)
        return jax.grad(loss)(mi)

    out["full_fwd_bwd"] = timed(f_fullbwd, model, reps=args.reps); print("STAGE", "full_fwd_bwd", round(out["full_fwd_bwd"],2), flush=True)

    print(json.dumps({k: round(v, 2) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
