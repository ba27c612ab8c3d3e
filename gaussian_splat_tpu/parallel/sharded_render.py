"""Sharded render pipeline: splat-parallel projection → all_gather →
tile-parallel rasterization.

Scheme (north-star configs 4-5, replacing the nothing-at-all of the reference,
SURVEY §2.3):

  * The GaussianModel is sharded over the primitive axis: each chip projects
    and shades N/D gaussians (embarrassingly parallel, the FLOP-heavy
    quat→Σ→EWA chain).
  * Screen-space features (12 floats/gaussian) are `all_gather`ed over ICI —
    at 1M splats this is ~48 MB/chip of gather traffic, far cheaper than
    moving per-tile pair lists.
  * Each chip then bins and rasterizes only its horizontal band of tile rows
    (tile sharding): the expensive pair sort + raster is 1/D per chip, and the
    output image is row-sharded with no further communication.
  * Autodiff through `shard_map` transposes the all_gather into a
    reduce-scatter of feature gradients, landing per-shard parameter grads on
    the owning chip — the "gradient all-reduce overlapped with backward" of
    the north star falls out of XLA's collective scheduling.

The image height is padded so every chip owns an equal integer number of tile
rows; callers crop. Within each chip's band the math is identical to the
single-chip path (same binning, same kernels), so sharded output is
bit-comparable to single-chip rendering.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops.projection import ProjectedGaussians
from gaussian_splat_tpu.ops.render import _project_and_shade


def _band_geometry(config: RenderConfig, height: int, ndev: int) -> Tuple[int, int]:
    """(tile_rows_per_device, padded_height)."""
    ty_n = config.tiles_y(height)
    rows_per_dev = -(-ty_n // ndev)
    return rows_per_dev, rows_per_dev * ndev * config.tile_height


def render_sharded(
    model: GaussianModel,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    axis_name: str = "dev",
) -> Tuple[jax.Array, jax.Array]:
    """Render with splat+tile sharding over `mesh`. Returns (image (H,W,3),
    t_final (H,W)) as row-sharded global arrays (cropped to the true height).

    Requires model.num_gaussians % ndev == 0 (pad the model if needed).
    """
    ndev = mesh.shape[axis_name]
    width, height = camera.width, camera.height
    rows_per_dev, padded_h = _band_geometry(config, height, ndev)
    band_h = rows_per_dev * config.tile_height

    # per-device pair budget covers only 1/D of the tiles
    local_cfg = dataclasses.replace(
        config, pairs_per_gaussian=config.pairs_per_gaussian / ndev
    )

    if config.backend == "pallas" or (
        config.backend == "auto" and jax.default_backend() == "tpu"
    ):
        from gaussian_splat_tpu.ops.pallas_raster import render_tiled_pallas as _raster_band
    else:
        from gaussian_splat_tpu.ops.tile_raster import render_tiled as _raster_band

    def body(model_shard: GaussianModel, cam: Camera):
        idx = jax.lax.axis_index(axis_name)

        proj, colors = _project_and_shade(model_shard, cam, config)
        from gaussian_splat_tpu.ops.render import _effective_opacities

        opac = _effective_opacities(model_shard, proj, config)
        feats = jnp.concatenate(
            [
                proj.means2d,  # 0:2
                proj.conics,  # 2:5
                proj.depths[:, None],  # 5
                proj.radii.astype(jnp.float32)[:, None],  # 6
                proj.valid.astype(jnp.float32)[:, None],  # 7
                colors,  # 8:11
                opac[:, None],  # 11
            ],
            axis=1,
        )  # (N/D, 12)
        feats_all = jax.lax.all_gather(feats, axis_name, tiled=True)  # (N, 12)

        row0_px = (idx * band_h).astype(jnp.float32)
        means2d = feats_all[:, 0:2] - jnp.stack(
            [jnp.float32(0.0), row0_px]
        )
        proj_all = ProjectedGaussians(
            means2d=means2d,
            conics=feats_all[:, 2:5],
            depths=feats_all[:, 5],
            radii=feats_all[:, 6].astype(jnp.int32),
            valid=feats_all[:, 7] > 0.5,
            cov2d=feats_all[:, 2:5],  # placeholder (debug only)
        )
        image, t_final, depth = _raster_band(
            proj_all,
            feats_all[:, 8:11],
            feats_all[:, 11],
            width,
            band_h,
            local_cfg,
        )
        return image, t_final, depth

    image, t_final, depth = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis_name), None),
        out_specs=(P(axis_name), P(axis_name), P(axis_name)),
        check_vma=False,
    )(model, camera)

    # padded_h ≥ height; crop (keeps row sharding of the leading rows)
    return image[:height], t_final[:height], depth[:height]
