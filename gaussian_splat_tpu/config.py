"""Configuration for the render / train pipelines.

The reference hardcodes all of its configuration — PLY path
(/root/reference/src/main.mm:69-70), window size (main.mm:22-23), OIT mode
(instanced_splat_renderer.mm:38), AABB clip radius (instanced_splat_renderer.mm:384),
fragment cap (shaders/gaussian_splat_50layer.metal:8), camera tunables
(trackball_camera.h:28-37). This module is the real config/flag system the survey
(§5) calls for: frozen dataclasses usable as jit static arguments, plus CLI glue.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rasterization configuration (hashable: usable as a jit static arg).

    Numeric-semantics constants are shared verbatim between the pure-JAX oracle
    rasterizer and the Pallas kernels so they agree to floating-point tolerance.
    """

    # Tiling -----------------------------------------------------------------
    # 32×16 px tiles (vs the classic square 16): fewer tiles per splat shrinks
    # the dominant pair sort AND drops the tile-id key to 12 bits at 1080p, so
    # (tile, depth-rank) packs into ONE u32 — a payload-free unstable sort is
    # ~2.5× faster than the 2-key stable sort (measured, see ops/binning.py).
    # The kernel trades ~1.3× more pixel-gaussian evals for it. (The unused
    # imageblock prototype in the reference chose square 16×16 tiles,
    # shaders/gaussian_splat_types.h:7-9.)
    tile_width: int = 32  # pixels per tile in x
    tile_height: int = 16  # pixels per tile in y
    chunk_size: int = 128  # gaussians processed per MXU chunk inside the tile kernel
    #   (must be a multiple of the 128-lane width so chunk DMAs are lane-aligned).
    #   Segments are UNALIGNED: kernels stream 128-aligned supersets with row
    #   masks, and the backward RMWs the boundary chunk shared with the
    #   preceding tile (safe: TPU grid programs execute sequentially).
    tiles_per_program: int = 4  # tiles batched per forward-kernel grid
    #   program: R tiles share one flattened cross-tile DMA pipeline, so the
    #   per-program fixed cost (grid machinery, iota builds, and the first
    #   DMA's exposed latency — dominant on shallow ~1-2-superset segments)
    #   amortizes R×. Output-bitwise-identical to 1 (per-tile math untouched);
    #   see pallas_raster.RasterStatics.rtiles.
    dma_chunks: int = 2  # compute chunks per kernel DMA — the kernels are
    #   DMA-issue/loop-overhead bound, so each transfer fetches
    #   chunk_size·dma_chunks pairs (measured best at 2; the pair array is
    #   padded so superset reads past the last segment stay in bounds)

    # Binning capacities (static shapes on a shape-static compiler) ----------
    max_tiles_per_gaussian: int = 32  # cap on tile-rect area for the BIG tier;
    #   radii are shrunk to fit (the reference instead drops overflow fragments
    #   outright, shaders/gaussian_splat_50layer.metal:172)
    small_tiles_per_gaussian: int = 6  # tile-rect cap for the small tier (most
    #   gaussians); the padded-sort size is N·small + (N/fraction)·max. With
    #   the exact elliptical-AABB extents, 99.9% of small-tier gaussians on
    #   the 1M bench scene have area ≤ 6 (94.7% ≤ 4), so 6 adds zero crop
    #   there while shrinking the padded pair sort 9M → 7M entries; crops on
    #   denser scenes are center-biased and counted in clamped_rects
    big_gaussian_fraction: int = 32  # the N/fraction largest-area gaussians get
    #   the max_tiles_per_gaussian block instead of the small one
    big_tier_capacity: Optional[int] = None  # absolute override of the big
    #   tier's static capacity (slots). The fraction heuristic under-sizes
    #   scenes whose pixel scale makes many splats big-tier-ELIGIBLE (area >
    #   small_tiles_per_gaussian): config 5's 3M @ 4K has ~13% eligible vs the
    #   ~3% the fraction assumes, overflowing the tier 308k deep (round-4
    #   verdict item 2). Size it from a calibration frame's eligible count
    #   (binning reports `tier_overflow` as the runtime sentinel); when the
    #   capacity covers every eligible splat, tier membership is a pure
    #   per-gaussian threshold and the sharded pair partition is exact.
    pairs_per_gaussian: float = 4.0  # pair budget = ceil(N * pairs_per_gaussian);
    #   the 1M-splat bench scene uses ~2.85 at 32×16 tiles with the exact
    #   elliptical-AABB rects (~3.3 with the older circular rects) — overflow
    #   beyond the budget drops whole farthest gaussians (rank-deterministic)
    #   and is reported in BinningResult.overflow. Every B-proportional stage
    #   (pair row gather, VJP rank sort, segment-sum) scales with this.

    # Projection -------------------------------------------------------------
    near_plane: float = 0.01  # near cull (reference: zFront < 1e-4 degenerate-vert
    #   cull, shaders/gaussian_splat.metal:125-131)
    cov2d_dilation: float = 0.3  # low-pass diagonal lift on the 2D covariance
    #   (reference lifts by 1e-4, shaders/gaussian_splat.metal:161-163; 0.3 px is the
    #   gsplat/3DGS anti-aliasing convention this framework's semantics follow)
    sigma_extent: float = 3.0  # billboard extent in σ (reference: 3σ,
    #   shaders/gaussian_splat.metal:173-174). Contributions beyond this extent
    #   (σ > sigma_cutoff) are zeroed in EVERY backend, so the oracle and the
    #   tiled paths agree exactly: a pixel outside a splat's tile rect is
    #   provably outside its extent ellipse.

    opacity_aware_extent: bool = True  # shrink billboard extents to
    #   √(2·ln(op/alpha_skip)·λmax) when tighter than sigma_extent: pixels
    #   beyond it have α < alpha_skip and are zeroed by every backend anyway,
    #   so this changes NOTHING in the output while bounding tile-rect crop
    #   error and cutting pair counts for dim splats
    antialiased: bool = False  # gsplat "antialiased" mode: scale opacity by
    #   √(det Σ / det(Σ+dilation·I)) so sub-pixel splats fade out instead of
    #   aliasing (the dilation's principled counterpart)

    # Compositing ------------------------------------------------------------
    alpha_clamp: float = 0.999  # max per-splat alpha (gsplat semantics)
    alpha_skip: float = 1.0 / 255.0  # contributions below this are dropped
    #   (reference uses 0.01, shaders/gaussian_splat_50layer.metal:156-157; 1/255 is
    #   the gsplat convention — documented deviation per SURVEY §7)
    transmittance_eps: float = 1e-6  # early chunk-skip threshold in the Pallas
    #   kernel; semantics are defined with NO early-out (τ=0) so oracle and kernel
    #   agree, and this only gates a skip whose error is ≤ τ
    sat_check: bool = True  # per-superset early-saturation skip in the Pallas
    #   kernels (a (P,1) max-reduce per iteration buys skipping all remaining
    #   chunks once every pixel saturates below transmittance_eps — measured
    #   3× its own bookkeeping cost even on a random scene). False = exact
    #   τ=0 semantics with no skip; True deviates by ≤ transmittance_eps.
    exact_vjp: bool = False  # True: f32 per-pair gradients through the VJP rank
    #   sort (11 operands, bit-faithful); False (default): bf16-packed payload
    #   (5 u32 operands, ~16 ms faster at 1M/1080p) with per-gaussian error
    #   ≤ 2⁻⁹·Σ|per-pair terms| — far below minibatch gradient noise, but
    #   visible on near-cancelling sums (see ops/pallas_raster.RasterStatics)

    # SH ---------------------------------------------------------------------
    sh_degree: int = 3  # active SH degree (reference parses all 45 f_rest coeffs
    #   but only uses DC, ply_loader.cpp:9-20,76-82; we evaluate the full basis)

    # Background -------------------------------------------------------------
    background: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    # Backend ----------------------------------------------------------------
    backend: str = "auto"  # "auto" | "pallas" | "jnp_tile" | "reference"

    # Sharding (parallel/sharded_render.py) -----------------------------------
    shard_exchange: str = "all_gather"  # how projected features reach the
    #   tile-owning chips: "all_gather" (dense, 12 floats/splat — best ≤8
    #   devices, and each chip then bins only the splats intersecting its
    #   band) or "all_to_all" (the north-star sparse exchange: each chip sends
    #   only the splats whose rect hits the destination band — traffic and
    #   per-chip memory stay O(N/D) as the mesh grows)
    shard_capacity_margin: float = 0.25  # all_gather path: each chip bins at
    #   most N/D + margin·N splats (the in-band compaction cap). The additive
    #   form matches the measured structure of band incidence: N/D residents
    #   plus an absolute tail of large splats whose extents cross band
    #   boundaries (the tail barely shrinks with D — measured 0.078·N on the
    #   1M bench scene at 8 bands, 0.22·N on the 30k rehearsal scene). The
    #   round-4 multiplicative cap N·2.0/D degenerated to "no compaction" at
    #   D=2 (work preservation 0.588, verdict item 5) while a smaller factor
    #   silently dropped splats at D≥4; the margin form keeps compaction
    #   effective at every D. Drops are counted in stats.dropped_gaussians —
    #   calibrate_render_config(mesh_ndev=...) sizes the margin per scene.
    a2a_capacity_factor: float = 4.0  # all_to_all path: per (source, dest)
    #   send-buffer capacity = N/D² · factor; overflow is counted per source
    shard_capacity_floor: int = 4096  # minimum capacity regardless of factor:
    #   small scenes (where band-splat incidence ≫ N/D, e.g. single-tile-row
    #   bands) stay exact at negligible cost; at production N the factor term
    #   dominates. Tests lower this to exercise the overflow accounting.

    @property
    def sigma_cutoff(self) -> float:
        """Falloff-argument cutoff: σ(d) = 0.5·dᵀΣ⁻¹d > 0.5·extent² ⇒ no contribution."""
        return 0.5 * self.sigma_extent**2

    @property
    def tile_pixels(self) -> int:
        return self.tile_width * self.tile_height

    def tiles_x(self, width: int) -> int:
        return -(-width // self.tile_width)

    def tiles_y(self, height: int) -> int:
        return -(-height // self.tile_height)

    def num_tiles(self, width: int, height: int) -> int:
        return self.tiles_x(width) * self.tiles_y(height)

    def big_capacity(self, n_eff: int) -> int:
        """Static big-tier slot count for an n_eff-row binning pass.

        Floor of 64: small scenes get the full-size tier everywhere (the
        fraction only matters once N is large enough for the sort to hurt).
        `big_tier_capacity` overrides the fraction heuristic absolutely."""
        if self.big_tier_capacity is not None:
            return min(n_eff, max(self.big_tier_capacity, 1))
        return min(n_eff, max(n_eff // self.big_gaussian_fraction + 1, 64))

    def pair_budget(self, n_gaussians: int) -> int:
        """Static pair-list capacity, rounded up to a chunk multiple.

        Small scenes get their exact worst case (N·max_tiles_per_gaussian) so
        truncation can never occur; large scenes get the amortized
        `pairs_per_gaussian` budget (with a floor), and overflow is reported by
        `BinningResult.overflow`."""
        m_big = self.big_capacity(n_gaussians)
        worst = (
            n_gaussians * self.small_tiles_per_gaussian
            + m_big * self.max_tiles_per_gaussian
        )
        budget = min(worst, max(int(n_gaussians * self.pairs_per_gaussian), 4096))
        c = self.chunk_size
        return -(-budget // c) * c


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration (north-star config 5)."""

    lr_means: float = 1.6e-4
    lr_means_final: float = 1.6e-6  # 3DGS position-lr exponential decay target
    lr_decay_steps: Optional[int] = None  # decay horizon (defaults to the 3DGS
    #   30 000-iteration convention, independent of num_steps)
    lr_quats: float = 1e-3
    lr_scales: float = 5e-3
    lr_opacities: float = 5e-2
    lr_sh: float = 2.5e-3
    sh_warmup_every: int = 0  # 3DGS SH warmup: raise the active SH degree by 1
    #   every K steps (coefficients of inactive bands are zeroed inside the
    #   jitted step — degree stays trace-static, so no recompilation). 0 = off.
    ssim_weight: float = 0.2  # loss = (1-w)*L1 + w*(1-SSIM), 3DGS convention
    num_steps: int = 1000
    steps_per_dispatch: int = 1  # lax.scan'd train steps per jitted dispatch:
    #   amortizes the per-dispatch host↔device floor (~30 ms on the dev
    #   tunnel) and lets XLA keep model/opt state on-device between steps
    checkpoint_every: int = 500
    checkpoint_dir: Optional[str] = None
