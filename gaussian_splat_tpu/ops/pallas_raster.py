"""Fused Pallas tile-rasterization kernels: forward + analytic backward.

The TPU-native replacement for the reference's fragment pipeline
(/root/reference/shaders/gaussian_splat_50layer.metal:149-223 — atomic per-pixel
fragment lists + per-pixel insertion sort) re-thought for the MXU:

  * Grid = one program per 16×16 tile. Each program streams its (chunk-aligned)
    segment of the depth-sorted pair list from HBM through a double-buffered
    VMEM window (no atomics, no sorting in the kernel — binning already ordered
    everything).
  * Compositing is reformulated so the sequential front-to-back recurrence
    becomes dense linear algebra:
        T_i = T_in · exp( Σ_{j<i, chunk} log1p(−α_j) )
    i.e. an exclusive prefix-sum in log space, computed for a whole chunk at
    once as a strictly-lower-triangular (G×G) matmul on the MXU; the color
    accumulation Σ_i c_i·α_i·T_i is a second (3×G)·(G×P) matmul.
  * The backward pass needs the suffix sums Σ_{j>i} — rewritten via
    Σ_{j>i} x_j = X_total − Σ_{j≤i} x_j so it walks front-to-back in ONE pass
    (the gsplat CUDA kernel walks back-to-front instead), reusing the forward's
    chunk structure and the saved per-tile outputs (C, T_final) as residuals.

Layout: pair features are pre-gathered (outside the kernel, so JAX autodiff of
the gather handles the per-gaussian scatter-add of gradients) into a
(B_pad, 16) f32 array — [mx, my, A, B, C, r, g, b, opacity, pad×7] — whose
per-tile segments are chunk-aligned by the binning pass, so every DMA is a
contiguous, aligned (G, 16) block and backward chunk writes never straddle two
tiles' segments.

Per-tile outputs are (8, P) blocks (P = tile_size², lane-aligned): rows 0-2 RGB,
row 3 T_final, rows 4-7 zero padding to the f32 sublane tile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.ops.binning import bin_gaussians
from gaussian_splat_tpu.ops.projection import ProjectedGaussians
from gaussian_splat_tpu.ops.tile_raster import tiles_to_image

NFEAT = 16  # padded feature row: mx,my,A,B,C,r,g,b,op + 7 pad
NROW = 8  # output rows per tile: r,g,b,T_final + 4 pad (f32 sublane tile)


class RasterStatics(NamedTuple):
    """Hashable static parameters for the kernels (jit/custom_vjp friendly)."""

    tile_size: int
    tiles_x: int
    tiles_y: int
    chunk: int
    alpha_clamp: float
    alpha_skip: float
    sigma_cutoff: float
    trans_eps: float
    interpret: bool


def _pixel_coords(static: RasterStatics, tile_id):
    """Pixel-center coordinates of a tile as (1, P) rows (P = ts²)."""
    ts = static.tile_size
    npix = ts * ts
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    tx = tile_id % static.tiles_x
    ty = tile_id // static.tiles_x
    px = (tx * ts + lane % ts).astype(jnp.float32) + 0.5
    py = (ty * ts + lane // ts).astype(jnp.float32) + 0.5
    return px, py


def _chunk_alpha(static: RasterStatics, f, px, py, base, cnt):
    """Shared forward math for one (G, NFEAT) feature chunk.

    Returns (alpha, la, extras) with alpha/la of shape (G, P).
    """
    g = static.chunk
    mx = f[:, 0:1]
    my = f[:, 1:2]
    A = f[:, 2:3]
    B = f[:, 3:4]
    C = f[:, 4:5]
    op = f[:, 8:9]

    dx = px - mx  # (G, P)
    dy = py - my
    sigma = 0.5 * (A * dx * dx + C * dy * dy) + B * dx * dy

    row = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0) + base
    row_valid = row < cnt

    alpha_raw = op * jnp.exp(-sigma)
    keep = (
        (sigma >= 0.0)
        & (sigma <= static.sigma_cutoff)
        & (alpha_raw >= static.alpha_skip)
        & row_valid
    )
    alpha = jnp.where(keep, jnp.minimum(alpha_raw, static.alpha_clamp), 0.0)
    la = jnp.log1p(-alpha)
    return alpha, la, (dx, dy, sigma, alpha_raw, keep)


def _tri_matrices(g: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    strict_lower = (r > c).astype(jnp.float32)  # exclusive prefix
    lower = (r >= c).astype(jnp.float32)  # inclusive prefix
    return strict_lower, lower


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(static: RasterStatics, offs_ref, cnts_ref, feats_hbm, out_ref, fbuf, sem):
    g = static.chunk
    npix = static.tile_size * static.tile_size
    t = pl.program_id(0)
    off = offs_ref[t]
    cnt = cnts_ref[t]
    nchunks = pl.cdiv(cnt, g)

    px, py = _pixel_coords(static, t)
    strict_lower, _ = _tri_matrices(g)

    out_ref[:, :] = jnp.zeros((NROW, npix), jnp.float32)

    def dma(slot, i):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(off + i * g, g), :],
            fbuf.at[slot],
            sem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    log_eps = np.log(max(static.trans_eps, 1e-30)).astype(np.float32)

    def body(i, logT):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            dma(1 - slot, i + 1).start()

        dma(slot, i).wait()

        # early-saturation skip: τ-bounded deviation from the τ=0 semantics
        live = logT > log_eps

        @pl.when(live)
        def _():
            f = fbuf[slot]  # (G, NFEAT)
            alpha, la, _ = _chunk_alpha(static, f, px, py, i * g, cnt)
            excl = jax.lax.dot_general(
                strict_lower,
                la,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (G, P) exclusive log-prefix within chunk
            t_in = jnp.exp(out_ref[3:4, :])  # (1, P) running transmittance
            w = alpha * jnp.exp(excl) * t_in  # (G, P) weights α_i·T_i
            rgb = f[:, 5:8]  # (G, 3)
            delta = jax.lax.dot_general(
                rgb,
                w,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (3, P)
            out_ref[0:3, :] = out_ref[0:3, :] + delta
            out_ref[3:4, :] = out_ref[3:4, :] + jnp.sum(la, axis=0, keepdims=True)

        new_logT = jnp.where(live, jnp.max(out_ref[3:4, :]), logT)
        return new_logT

    jax.lax.fori_loop(0, nchunks, body, jnp.float32(0.0))

    # row 3 held log T — exponentiate in place
    out_ref[3:4, :] = jnp.exp(out_ref[3:4, :])


def _raster_forward(pair_feats, offsets, counts, static: RasterStatics):
    num_tiles = static.tiles_x * static.tiles_y
    npix = static.tile_size * static.tile_size
    g = static.chunk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (NROW, npix), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, g, NFEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles * NROW, npix), jnp.float32),
        interpret=static.interpret,
    )(offsets, counts, pair_feats)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(
    static: RasterStatics,
    offs_ref,
    cnts_ref,
    feats_hbm,
    fwd_out_ref,  # (NROW, P) VMEM block: forward result for this tile
    cot_ref,  # (NROW, P) VMEM block: cotangent (rows 0-2 dC, row 3 dT_final)
    dfeats_hbm,  # output (B_pad, NFEAT) ANY
    fbuf,
    gbuf,
    sem,
    gsem,
    state,  # VMEM (2, P): row0 logT, row1 P-prefix accumulator
):
    g = static.chunk
    npix = static.tile_size * static.tile_size
    t = pl.program_id(0)
    off = offs_ref[t]
    cnt = cnts_ref[t]
    nchunks = pl.cdiv(cnt, g)

    px, py = _pixel_coords(static, t)
    strict_lower, lower = _tri_matrices(g)

    gC = cot_ref[0:3, :]  # (3, P)
    g_tf = cot_ref[3:4, :]  # (1, P)
    c_total = fwd_out_ref[0:3, :]
    t_final = fwd_out_ref[3:4, :]
    # Q = gC·C_total + g_Tf·T_final  (1, P)
    q = jnp.sum(gC * c_total, axis=0, keepdims=True) + g_tf * t_final

    state[0:1, :] = jnp.zeros((1, npix), jnp.float32)  # log T
    state[1:2, :] = jnp.zeros((1, npix), jnp.float32)  # prefix P

    def dma_in(slot, i):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(off + i * g, g), :],
            fbuf.at[slot],
            sem.at[slot],
        )

    def dma_out(slot, i):
        return pltpu.make_async_copy(
            gbuf.at[slot],
            dfeats_hbm.at[pl.ds(off + i * g, g), :],
            gsem.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma_in(0, 0).start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            dma_in(1 - slot, i + 1).start()

        dma_in(slot, i).wait()

        # wait for the previous output DMA that used this slot
        @pl.when(i >= 2)
        def _():
            dma_out(slot, i - 2).wait()

        f = fbuf[slot]
        alpha, la, (dx, dy, sigma, alpha_raw, keep) = _chunk_alpha(
            static, f, px, py, i * g, cnt
        )

        excl = jax.lax.dot_general(
            strict_lower, la, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t_i = jnp.exp(state[0:1, :] + excl)  # (G, P) transmittance before i
        w = alpha * t_i  # α_i·T_i

        rgb = f[:, 5:8]
        v = jax.lax.dot_general(
            rgb, gC, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, P) = gC·c_i per pixel
        contrib = v * w
        incl = state[1:2, :] + jax.lax.dot_general(
            lower, contrib, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, P) inclusive prefix Σ_{j≤i} v_j α_j T_j

        one_minus_a = 1.0 - alpha  # ≥ 1 - alpha_clamp > 0
        da = v * t_i - (q - incl) / one_minus_a  # (G, P)

        # chain through α = min(α_raw, clamp) with masks
        grad_live = keep & (alpha_raw < static.alpha_clamp)
        da = jnp.where(grad_live, da, 0.0)
        dop_pix = da * jnp.exp(-sigma)
        dsigma = -da * alpha_raw  # d(op·e^{-σ})/dσ = −α_raw

        A = f[:, 2:3]
        B = f[:, 3:4]
        C = f[:, 4:5]
        ddx = dsigma * (A * dx + B * dy)
        ddy = dsigma * (C * dy + B * dx)

        dmx = -jnp.sum(ddx, axis=1, keepdims=True)  # (G,1)
        dmy = -jnp.sum(ddy, axis=1, keepdims=True)
        dA = jnp.sum(dsigma * 0.5 * dx * dx, axis=1, keepdims=True)
        dB = jnp.sum(dsigma * dx * dy, axis=1, keepdims=True)
        dC = jnp.sum(dsigma * 0.5 * dy * dy, axis=1, keepdims=True)
        dop = jnp.sum(dop_pix, axis=1, keepdims=True)
        # drgb: weights w are masked by keep already (α=0 ⇒ w=0)
        drgb = jax.lax.dot_general(
            w, gC, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (G, 3)

        zeros7 = jnp.zeros((g, NFEAT - 9), jnp.float32)
        gbuf[slot] = jnp.concatenate(
            [dmx, dmy, dA, dB, dC, drgb, dop, zeros7], axis=1
        )
        dma_out(slot, i).start()

        # advance carried state
        state[0:1, :] = state[0:1, :] + jnp.sum(la, axis=0, keepdims=True)
        state[1:2, :] = incl[g - 1 : g, :]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    # drain remaining output DMAs
    @pl.when(nchunks >= 2)
    def _():
        dma_out(jax.lax.rem(nchunks, 2), nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        dma_out(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()


def _raster_backward(pair_feats, offsets, counts, fwd_out, cot, static: RasterStatics):
    num_tiles = static.tiles_x * static.tiles_y
    npix = static.tile_size * static.tile_size
    g = static.chunk
    b_pad = pair_feats.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((NROW, npix), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NROW, npix), lambda t, *_: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, g, NFEAT), jnp.float32),
            pltpu.VMEM((2, g, NFEAT), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, npix), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, static),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, NFEAT), jnp.float32),
        interpret=static.interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(offsets, counts, pair_feats, fwd_out, cot)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _raster(pair_feats, offsets, counts, static: RasterStatics):
    return _raster_forward(pair_feats, offsets, counts, static)


def _raster_fwd(pair_feats, offsets, counts, static):
    out = _raster_forward(pair_feats, offsets, counts, static)
    return out, (pair_feats, offsets, counts, out)


def _raster_bwd(static, residuals, cot):
    pair_feats, offsets, counts, fwd_out = residuals
    d_feats = _raster_backward(pair_feats, offsets, counts, fwd_out, cot, static)
    zero_i32 = np.zeros(offsets.shape, dtype=jax.dtypes.float0)
    zero_c = np.zeros(counts.shape, dtype=jax.dtypes.float0)
    return d_feats, zero_i32, zero_c


_raster.defvjp(_raster_fwd, _raster_bwd)


# ---------------------------------------------------------------------------
# Public entry: full tiled pipeline with the Pallas kernels
# ---------------------------------------------------------------------------


def render_tiled_pallas(
    proj: ProjectedGaussians,
    colors: jax.Array,
    opacities: jax.Array,
    width: int,
    height: int,
    config: RenderConfig,
    interpret: bool = None,
) -> Tuple[jax.Array, jax.Array]:
    ts = config.tile_size
    tx_n = config.tiles_x(width)
    ty_n = config.tiles_y(height)
    num_tiles = tx_n * ty_n

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    static = RasterStatics(
        tile_size=ts,
        tiles_x=tx_n,
        tiles_y=ty_n,
        chunk=config.chunk_size,
        alpha_clamp=config.alpha_clamp,
        alpha_skip=config.alpha_skip,
        sigma_cutoff=config.sigma_cutoff,
        trans_eps=config.transmittance_eps,
        interpret=bool(interpret),
    )

    binning = bin_gaussians(proj, width, height, config)
    order = binning.order
    gidx = binning.pair_gauss
    valid_p = binning.pair_tile < num_tiles

    # pack per-gaussian features, then gather per pair (autodiff of these
    # gathers produces the per-gaussian scatter-add of gradients)
    feats = jnp.concatenate(
        [
            proj.means2d,
            proj.conics,
            colors,
            opacities[:, None],
            jnp.zeros((proj.means2d.shape[0], NFEAT - 9), jnp.float32),
        ],
        axis=1,
    )  # (N, 16)
    pair_feats = feats[order][gidx]  # (B_pad, 16)
    # padding rows must be inert: zero them (they were gathered from gaussian 0)
    pair_feats = jnp.where(valid_p[:, None], pair_feats, 0.0)

    tiles_flat = _raster(
        pair_feats, binning.tile_offsets, binning.tile_counts, static
    )  # (T·NROW, P)

    tiles = tiles_flat.reshape(num_tiles, NROW, ts * ts)
    tiles_rgb = jnp.swapaxes(tiles[:, 0:3, :], 1, 2)  # (T, P, 3)
    t_final_tiles = tiles[:, 3, :]  # (T, P)

    image = tiles_to_image(tiles_rgb, tx_n, ty_n, width, height, ts)
    t_final = tiles_to_image(
        t_final_tiles[..., None], tx_n, ty_n, width, height, ts
    )[..., 0]
    bg = jnp.asarray(config.background, jnp.float32)
    image = image + t_final[..., None] * bg
    return image, t_final
