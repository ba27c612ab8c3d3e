"""Grid/axes overlay renderer (C4/C5 parity)."""

import jax
import numpy as np

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.viewer.overlay import (
    axes,
    composite_over_background,
    grid,
    point_cloud,
    render_overlay,
    triangle_mesh,
)


def _cam(w=96, h=72):
    return Camera.from_lookat((0, 2, -5), (0, 0, 0), (0, 1, 0), 50.0, w, h)


def test_grid_structure():
    g = grid(10, 1.0)
    assert g.vertices.shape == (11 * 4, 3)  # (size+1) lines each way, 2 verts
    assert g.kind == "lines"


def test_axes_colors():
    a = axes(2.0)
    assert a.vertices.shape == (6, 3)
    np.testing.assert_allclose(a.vertices[1], [2, 0, 0])
    assert a.colors[0][0] > 0.9  # x axis red


def test_overlay_renders_lines():
    cam = _cam()
    rgb, cov = render_overlay([grid(6, 0.8), axes(1.5)], cam)
    rgb, cov = np.asarray(rgb), np.asarray(cov)
    assert rgb.shape == (72, 96, 3) and cov.shape == (72, 96)
    assert 0.0 < cov.mean() < 0.6  # some but not all pixels covered
    assert cov.max() <= 1.0 + 1e-6


def test_points_and_mesh():
    cam = _cam()
    pc = point_cloud([[0, 0, 0], [0.5, 0.2, 0]], [[1, 0, 0], [0, 1, 0]])
    tm = triangle_mesh([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], [0.5, 0.5, 0.5])
    rgb, cov = render_overlay([pc, tm], cam)
    assert np.asarray(cov).max() > 0.5


def test_behind_camera_culled():
    cam = _cam()
    pc = point_cloud([[0, 0, -100]], [[1, 1, 1]])  # far behind the camera
    _, cov = render_overlay([pc], cam)
    assert np.asarray(cov).max() < 1e-6


def test_composite_order_splats_over_overlay():
    cam = _cam(32, 32)
    rgb, cov = render_overlay([axes(1.0)], cam)
    # opaque splat layer hides the overlay entirely
    splat = np.ones((32, 32, 3), np.float32) * 0.7
    t0 = np.zeros((32, 32), np.float32)
    out = np.asarray(composite_over_background(splat, t0, rgb, cov))
    np.testing.assert_allclose(out, splat, atol=1e-6)
    # fully transparent splats reveal overlay-over-clearcolor
    t1 = np.ones((32, 32), np.float32)
    out2 = np.asarray(
        composite_over_background(np.zeros_like(splat), t1, rgb, cov, (0.1, 0.1, 0.15))
    )
    corners = out2[0, 0]
    np.testing.assert_allclose(corners, [0.1, 0.1, 0.15], atol=1e-5)
