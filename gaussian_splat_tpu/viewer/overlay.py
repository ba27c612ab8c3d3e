"""Line-geometry overlay: grid/axes renderables composited with splat renders.

Parity port of the reference's scene objects and geometry renderer:
  * `Renderable` / `Grid` / `Axes` / `TriangleMesh` / `PointCloud` mirror
    /root/reference/src/renderable.{h,cpp} (Grid is an N×N line lattice,
    renderable.cpp:5-26; Axes are RGB axis segments, renderable.cpp:28-40;
    the reference declares PointCloud but never defines it — here it works).
  * `render_overlay` replaces the SimpleGeometryRenderer draw pass
    (/root/reference/src/simple_geometry_renderer.mm:133-190): project
    world-space vertices with the shared camera and rasterize anti-aliased
    lines/points into an RGBA layer (vectorized jnp distance-to-segment —
    no scan over pixels).
  * Compositing matches the reference's pass order (geometry first, splats
    over it, /root/reference/src/main.mm:185-198): the overlay acts as the
    background the splats' residual transmittance reveals.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_tpu.camera import Camera


@dataclasses.dataclass
class Renderable:
    """vertices (V,3) float32, colors (V,3) float32 in [0,1], and a primitive
    kind: 'lines' (independent segments, V even) or 'points'."""

    vertices: np.ndarray
    colors: np.ndarray
    kind: str = "lines"
    model_matrix: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )


def grid(size: int = 10, spacing: float = 1.0, color=(0.35, 0.35, 0.4)) -> Renderable:
    """N×N line lattice on the y=0 plane (renderable.cpp:5-26)."""
    half = size * spacing / 2.0
    verts = []
    for i in range(size + 1):
        p = -half + i * spacing
        verts += [[p, 0.0, -half], [p, 0.0, half]]
        verts += [[-half, 0.0, p], [half, 0.0, p]]
    v = np.asarray(verts, np.float32)
    c = np.broadcast_to(np.asarray(color, np.float32), v.shape).copy()
    return Renderable(v, c, "lines")


def axes(length: float = 2.0) -> Renderable:
    """RGB world-axis segments (renderable.cpp:28-40)."""
    v = np.asarray(
        [
            [0, 0, 0], [length, 0, 0],
            [0, 0, 0], [0, length, 0],
            [0, 0, 0], [0, 0, length],
        ],
        np.float32,
    )
    c = np.asarray(
        [
            [1, 0.2, 0.2], [1, 0.2, 0.2],
            [0.2, 1, 0.2], [0.2, 1, 0.2],
            [0.3, 0.5, 1], [0.3, 0.5, 1],
        ],
        np.float32,
    )
    return Renderable(v, c, "lines")


def triangle_mesh(vertices, colors) -> Renderable:
    """Wireframe triangle mesh: (F,3,3) triangles → edge segments
    (TriangleMesh, renderable.cpp:42-46, drawn as its edges)."""
    tris = np.asarray(vertices, np.float32).reshape(-1, 3, 3)
    cols = np.broadcast_to(np.asarray(colors, np.float32), tris.shape).reshape(-1, 3, 3)
    edges = []
    ecols = []
    for a, b in [(0, 1), (1, 2), (2, 0)]:
        edges.append(np.stack([tris[:, a], tris[:, b]], axis=1))
        ecols.append(np.stack([cols[:, a], cols[:, b]], axis=1))
    v = np.concatenate(edges).reshape(-1, 3)
    c = np.concatenate(ecols).reshape(-1, 3)
    return Renderable(v, c, "lines")


def point_cloud(points, colors) -> Renderable:
    """Colored points (the reference declares PointCloud at renderable.h:71-80
    but never defines it — dead decl; functional here)."""
    return Renderable(
        np.asarray(points, np.float32), np.asarray(colors, np.float32), "points"
    )


def _project_points(verts: jax.Array, camera: Camera):
    """World → pixel coords + camera depth (shared convention with the splat
    pipeline; replaces per-object MVP at simple_geometry_renderer.mm:163-165)."""
    R = camera.rotation
    t = camera.translation
    p = verts @ R.T + t
    z = p[:, 2]
    zs = jnp.where(z > 1e-6, z, 1e-6)
    px = camera.fx * p[:, 0] / zs + camera.cx
    py = camera.fy * p[:, 1] / zs + camera.cy
    return jnp.stack([px, py], -1), z


def render_overlay(
    objects: Sequence[Renderable],
    camera: Camera,
    line_width: float = 1.2,
    point_radius: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """Rasterize renderables → (rgb (H,W,3), coverage (H,W)) layers."""
    H, W = camera.height, camera.width
    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        indexing="ij",
    )
    rgb = jnp.zeros((H, W, 3))
    cov = jnp.zeros((H, W))

    for obj in objects:
        model = jnp.asarray(obj.model_matrix, jnp.float32)
        verts = jnp.asarray(obj.vertices) @ model[:3, :3].T + model[:3, 3]
        pix, z = _project_points(verts, camera)
        cols = jnp.asarray(obj.colors)
        if obj.kind == "lines":
            a = pix[0::2]  # (S,2) segment starts
            b = pix[1::2]
            ca = cols[0::2]
            vis = (z[0::2] > 1e-6) & (z[1::2] > 1e-6)
            ab = b - a  # (S,2)
            len2 = jnp.maximum(jnp.sum(ab * ab, -1), 1e-12)
            # distance from every pixel to every segment (S,H,W)
            pax = xs[None] - a[:, 0, None, None]
            pay = ys[None] - a[:, 1, None, None]
            tpar = (pax * ab[:, 0, None, None] + pay * ab[:, 1, None, None]) / len2[:, None, None]
            tpar = jnp.clip(tpar, 0.0, 1.0)
            dx = pax - tpar * ab[:, 0, None, None]
            dy = pay - tpar * ab[:, 1, None, None]
            d = jnp.sqrt(dx * dx + dy * dy)
            alpha = jnp.clip(line_width + 0.5 - d, 0.0, 1.0) * vis[:, None, None]
            layer_cov = 1.0 - jnp.prod(1.0 - alpha, axis=0)
            layer_rgb = jnp.einsum("shw,sc->hwc", alpha, ca) / jnp.maximum(
                jnp.sum(alpha, 0)[..., None], 1e-6
            )
        else:  # points
            vis = z > 1e-6
            dx = xs[None] - pix[:, 0, None, None]
            dy = ys[None] - pix[:, 1, None, None]
            d = jnp.sqrt(dx * dx + dy * dy)
            alpha = jnp.clip(point_radius + 0.5 - d, 0.0, 1.0) * vis[:, None, None]
            layer_cov = 1.0 - jnp.prod(1.0 - alpha, axis=0)
            layer_rgb = jnp.einsum("phw,pc->hwc", alpha, cols) / jnp.maximum(
                jnp.sum(alpha, 0)[..., None], 1e-6
            )

        rgb = rgb * (1 - layer_cov[..., None]) + layer_rgb * layer_cov[..., None]
        cov = 1.0 - (1.0 - cov) * (1.0 - layer_cov)

    return rgb, cov


def composite_over_background(
    splat_image: jax.Array,
    t_final: jax.Array,
    overlay_rgb: jax.Array,
    overlay_cov: jax.Array,
    background=(0.1, 0.1, 0.15),
) -> jax.Array:
    """Splats over overlay over clear color — the reference's pass order
    (clear 0.1,0.1,0.15 at simple_geometry_renderer.mm:148-149, then geometry,
    then splats blended over, main.mm:185-198). Assumes splat_image was
    rendered with a BLACK background so T_final carries the residual."""
    bg = jnp.asarray(background, jnp.float32)
    under = overlay_rgb * overlay_cov[..., None] + bg * (1.0 - overlay_cov[..., None])
    return splat_image + t_final[..., None] * under
