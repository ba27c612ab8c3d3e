"""One-off experiments: split the pair-gather / gather-VJP costs on TPU.

Measures (bench scene, 1M splats @ 1080p):
  - row gather (B,10) with no transpose
  - row gather (B,16) padded table, no transpose
  - the (B,10) -> (16,B) transpose alone
  - current gather_pairs_t (gather + transpose)
  - VJP sub-pieces: pack, 6-op sort, unpack+stack, segsum, inv-perm, final take
  - elliptical-AABB rect areas vs circular (pair-count reduction potential)
"""

import json
import time

import jax
import jax.numpy as jnp

import gaussian_splat_tpu as gs
from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.ops import pallas_raster as pr
from gaussian_splat_tpu.ops.binning import bin_gaussians
from gaussian_splat_tpu.ops.render import _project_and_shade, _effective_opacities

N = 1_000_000
W, H = 1920, 1080
REPS = 8


def timed(fn, *args, reps=REPS, iters=5):
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
    key = jax.random.PRNGKey(0)
    model = gs.GaussianModel.random(
        key, N, sh_degree=1, extent=2.0, scale_range=(0.005, 0.02)
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0, W, H
    )
    config = RenderConfig(backend="pallas")
    num_tiles = config.num_tiles(W, H)

    proj, colors = jax.jit(lambda m: _project_and_shade(m, camera, config))(model)
    opac = jax.jit(lambda m: _effective_opacities(m, proj, config))(model)
    binning = jax.jit(lambda p: bin_gaussians(p, W, H, config))(proj)
    jax.block_until_ready((proj, colors, opac, binning))

    valid_p = binning.pair_tile < num_tiles
    ranks_keyed = jnp.where(valid_p, binning.pair_gauss, N)
    feats10 = jnp.concatenate(
        [proj.means2d, proj.conics, colors, proj.depths[:, None], opac[:, None]],
        axis=1,
    )
    B = int(binning.pair_tile.shape[0])
    out = {"B": B, "num_pairs": int(binning.num_pairs)}

    # --- forward gather variants -------------------------------------------
    table10 = jnp.concatenate(
        [jnp.take(feats10, binning.order, axis=0), jnp.zeros((1, 10))], axis=0
    )
    table16 = jnp.concatenate([table10, jnp.zeros((N + 1, 6))], axis=1)
    idx = jnp.minimum(ranks_keyed, N)
    jax.block_until_ready((table10, table16, idx))

    out["gather_rows10"] = timed(
        lambda t, i: jnp.take(t + 1e-9 * i, idx, axis=0), table10
    )
    out["gather_rows16"] = timed(
        lambda t, i: jnp.take(t + 1e-9 * i, idx, axis=0), table16
    )
    rows10 = jnp.take(table10, idx, axis=0)
    jax.block_until_ready(rows10)
    out["transpose_only"] = timed(lambda r, i: (r + 1e-9 * i).T, rows10)
    out["gather_full_current"] = timed(
        lambda f, i: pr.gather_pairs_t(
            f + 1e-9 * i, binning.order, ranks_keyed, binning.rank_starts, False
        ),
        feats10,
    )
    # table build alone (1M-row gather + concat)
    out["table_build"] = timed(
        lambda f, i: jnp.take(f + 1e-9 * i, binning.order, axis=0), feats10
    )
    print("fwd:", json.dumps(out), flush=True)

    # --- VJP sub-pieces ------------------------------------------------------
    d_pairs = jnp.ones((pr.NFEAT, B), jnp.float32)
    packed = pr._pack_bf16_pairs([d_pairs[j] for j in range(pr.NCOLS_LIVE)])
    jax.block_until_ready(packed)

    out["vjp_pack"] = timed(
        lambda dp, i: pr._pack_bf16_pairs(
            [dp[j] + 1e-9 * i for j in range(pr.NCOLS_LIVE)]
        ),
        d_pairs,
    )
    out["vjp_sort6"] = timed(
        lambda rk, i: jax.lax.sort(
            (rk + (i * 0).astype(rk.dtype), *packed), num_keys=1
        ),
        ranks_keyed,
    )
    sorted_ops = jax.lax.sort((ranks_keyed, *packed), num_keys=1)
    jax.block_until_ready(sorted_ops)

    def f_unpack_stack(so0, i):
        cols = pr._unpack_bf16_pairs([s + (i * 0).astype(s.dtype) for s in sorted_ops[1:]])
        zrow = jnp.zeros_like(cols[0])
        return jnp.stack(cols + [zrow] * (pr.NFEAT - pr.NCOLS_LIVE), axis=0)

    out["vjp_unpack_stack"] = timed(f_unpack_stack, sorted_ops[0])
    data = f_unpack_stack(sorted_ops[0], jnp.float32(0))
    jax.block_until_ready(data)
    out["vjp_segsum"] = timed(
        lambda d, i: pr._segment_sum_by_rank(
            d + 1e-9 * i, sorted_ops[0], binning.rank_starts, N, False
        ),
        data,
    )
    out["vjp_invperm_sort"] = timed(
        lambda o, i: jax.lax.sort(
            (o + (i * 0).astype(o.dtype), jnp.arange(N, dtype=jnp.int32)), num_keys=1
        ),
        binning.order,
    )
    d_rank = pr._segment_sum_by_rank(data, sorted_ops[0], binning.rank_starts, N, False)
    _, inv = jax.lax.sort((binning.order, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    jax.block_until_ready((d_rank, inv))
    out["vjp_final_take"] = timed(
        lambda dr, i: jnp.take((dr + 1e-9 * i).T, inv, axis=0), d_rank
    )
    out["vjp_full_current"] = timed(
        lambda dp, i: pr._gather_pairs_t_bwd(
            False, (binning.order, ranks_keyed, binning.rank_starts, N), dp + 1e-9 * i
        )[0],
        d_pairs,
    )
    print("vjp:", json.dumps({k: v for k, v in out.items()}), flush=True)

    # --- elliptical AABB potential ------------------------------------------
    # current rect: square extent radius = sqrt(2*sigma_max*lambda_max)
    # exact ellipse AABB: rx = sqrt(2*sigma_max*cov_a), ry = sqrt(2*sigma_max*cov_c)
    a = proj.cov2d[:, 0]
    b_ = proj.cov2d[:, 1]
    c = proj.cov2d[:, 2]
    det = a * c - b_ * b_
    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    r2 = proj.radii.astype(jnp.float32) ** 2
    sigma_max = jnp.where(lam_max > 0, r2 / (2 * lam_max), 0.0)
    rx = jnp.sqrt(2 * sigma_max * a)
    ry = jnp.sqrt(2 * sigma_max * c)
    tw, th = config.tile_width, config.tile_height
    mx, my = proj.means2d[:, 0], proj.means2d[:, 1]

    def rect_area(rxx, ryy):
        tx0 = jnp.clip(jnp.floor((mx - rxx) / tw), 0, config.tiles_x(W))
        tx1 = jnp.clip(jnp.ceil((mx + rxx) / tw), 0, config.tiles_x(W))
        ty0 = jnp.clip(jnp.floor((my - ryy) / th), 0, config.tiles_y(H))
        ty1 = jnp.clip(jnp.ceil((my + ryy) / th), 0, config.tiles_y(H))
        return jnp.sum(
            jnp.where(proj.valid, (tx1 - tx0) * (ty1 - ty0), 0.0)
        )

    r = proj.radii.astype(jnp.float32)
    area_circ = float(rect_area(r, r))
    area_ell = float(rect_area(rx, ry))
    out["pairs_circular_aabb"] = area_circ
    out["pairs_elliptical_aabb"] = area_ell
    out["ellipse_reduction"] = round(1 - area_ell / max(area_circ, 1), 4)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
