"""Top-level render pipeline: activations → SH → projection → rasterization.

TPU-native replacement for the reference's frame encoding
(/root/reference/src/instanced_splat_renderer.mm:424-528): instead of a draw call
plus OIT passes, one jitted function composes cull → project → bin → sort →
raster over device arrays. Backend selection:

  * "reference": the O(N·H·W) oracle (tests/small scenes; exact semantics)
  * "jnp_tile":  tile binning + segmented-cumsum compositing in pure jnp
                 (CPU-friendly, differentiable via autodiff)
  * "pallas":    fused Pallas tile kernels with custom VJP (the fast path)
  * "auto":      pallas on TPU, jnp_tile otherwise
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops import reference as reference_ops
from gaussian_splat_tpu.ops import sh as sh_ops
from gaussian_splat_tpu.ops.projection import ProjectedGaussians, project_gaussians, view_directions


class RenderOutput(NamedTuple):
    image: jax.Array  # (H, W, 3) composited color (background applied)
    alpha: jax.Array  # (H, W) 1 − T_final
    depth: jax.Array = None  # (H, W) α-weighted expected camera-space depth
    projected: Optional[ProjectedGaussians] = None  # per-gaussian debug info


def _project_and_shade(model: GaussianModel, camera: Camera, config: RenderConfig):
    proj = project_gaussians(
        model.means,
        model.quats,
        model.scales,
        camera,
        near_plane=config.near_plane,
        cov2d_dilation=config.cov2d_dilation,
        sigma_extent=config.sigma_extent,
        # opacity-aware extents are an upper bound for the antialiased mode
        # too: compensation ≤ 1 only lowers effective opacity further
        opacities=model.opacities if config.opacity_aware_extent else None,
        alpha_skip=config.alpha_skip if config.opacity_aware_extent else None,
    )
    degree = min(config.sh_degree, model.sh_degree)
    dirs = view_directions(model.means, camera)
    colors = sh_ops.eval_sh(degree, model.sh, dirs)
    return proj, colors


def _effective_opacities(model: GaussianModel, proj, config: RenderConfig):
    op = model.opacities
    if config.antialiased:
        op = op * proj.compensation
    return op


def render(
    model: GaussianModel,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    screen_offset: Optional[jax.Array] = None,
) -> RenderOutput:
    """Render a scene. Differentiable w.r.t. every GaussianModel leaf.

    `screen_offset` is an optional (N, 2) array added to the projected 2D
    means. Training passes zeros and differentiates w.r.t. it to obtain the
    SCREEN-SPACE positional gradient — the 3DGS densification criterion —
    without a second rendering pass."""
    backend = config.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp_tile"

    proj, colors = _project_and_shade(model, camera, config)
    if screen_offset is not None:
        proj = proj._replace(means2d=proj.means2d + screen_offset)
    opacities = _effective_opacities(model, proj, config)

    if backend == "reference":
        image, t_final, depth = reference_ops.render_reference(
            proj.means2d,
            proj.conics,
            colors,
            opacities,
            proj.depths,
            proj.valid,
            camera.width,
            camera.height,
            config,
        )
    elif backend == "jnp_tile":
        from gaussian_splat_tpu.ops import tile_raster

        image, t_final, depth = tile_raster.render_tiled(
            proj, colors, opacities, camera.width, camera.height, config
        )
    elif backend == "pallas":
        from gaussian_splat_tpu.ops import pallas_raster

        image, t_final, depth = pallas_raster.render_tiled_pallas(
            proj, colors, opacities, camera.width, camera.height, config
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    return RenderOutput(
        image=image, alpha=1.0 - t_final, depth=depth, projected=proj
    )
