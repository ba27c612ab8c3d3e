"""Trackball camera behavior (ported control scheme) + headless viewer."""

import numpy as np

from gaussian_splat_tpu.viewer.trackball import TrackballCamera


def test_zoom_changes_distance_with_clamps():
    tb = TrackballCamera()
    d0 = tb.distance
    tb.handle_scroll(1.0)  # zoom in (0.95^1.2 < 1)
    assert tb.distance < d0
    # clamp at min distance (trackball_camera.mm:33-37)
    for _ in range(200):
        tb.handle_scroll(5.0)
    assert tb.distance >= 0.1 - 1e-9
    for _ in range(300):
        tb.handle_scroll(-5.0)
    assert tb.distance <= 100.0 + 1e-9


def test_rotate_preserves_distance_and_target():
    tb = TrackballCamera()
    d0 = tb.distance
    t0 = tb.target.copy()
    tb.handle_mouse_down(100, 100, button=0)
    tb.handle_mouse_move(160, 130)
    tb.handle_mouse_up()
    assert abs(tb.distance - d0) < 1e-9
    np.testing.assert_allclose(tb.target, t0)
    # up stays unit
    assert abs(np.linalg.norm(tb.up) - 1.0) < 1e-9


def test_horizontal_rotation_about_world_y():
    tb = TrackballCamera(position=np.array([0.0, 0.0, 5.0]))
    y0 = tb.position[1]
    tb.handle_mouse_down(0, 0, button=0)
    tb.handle_mouse_move(50, 0)  # pure horizontal drag
    assert abs(tb.position[1] - y0) < 1e-9  # world-Y rotation keeps height
    assert abs(tb.distance - 5.0) < 1e-9


def test_pan_moves_target_and_position_together():
    tb = TrackballCamera()
    rel0 = tb.position - tb.target
    tb.handle_mouse_down(0, 0, button=1)  # pan button (trackball_camera.mm:39-48)
    tb.handle_mouse_move(30, -20)
    rel1 = tb.position - tb.target
    np.testing.assert_allclose(rel0, rel1, atol=1e-9)
    assert np.linalg.norm(tb.target) > 0  # target moved


def test_no_drag_without_mouse_down():
    tb = TrackballCamera()
    p0 = tb.position.copy()
    tb.handle_mouse_move(500, 500)
    np.testing.assert_allclose(tb.position, p0)


def test_camera_emits_valid_view():
    tb = TrackballCamera()
    cam = tb.camera(640, 480)
    assert cam.width == 640 and cam.height == 480
    # camera looks at the target: target projects to the principal point
    import jax.numpy as jnp

    p = cam.viewmat @ jnp.array([*tb.target, 1.0])
    assert float(p[2]) > 0  # target in front (+z fwd)
    assert abs(float(p[0])) < 1e-6 and abs(float(p[1])) < 1e-6


def test_headless_viewer_renders_and_reports(tmp_path):
    import jax

    from gaussian_splat_tpu.config import RenderConfig
    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.viewer.viewer import Viewer

    model = GaussianModel.random(jax.random.PRNGKey(0), 50, sh_degree=0)
    v = Viewer(model, RenderConfig(backend="jnp_tile"), width=64, height=48)
    frame = v.render_frame()
    assert frame.shape == (48, 64, 3) and frame.dtype == np.uint8
    m = v.metrics()
    assert m["num_gaussians"] == 50
    assert m["frame_ms"] > 0


# ---------------------------------------------------------------------------
# Round-2 additions: overlay compositing, resize, hot reload in the live loop
# (VERDICT item 8 — reference product parity with main.mm:185-198, 50-52,
# instanced_splat_renderer.mm:430-432)
# ---------------------------------------------------------------------------


def _tiny_viewer(**kw):
    import jax

    from gaussian_splat_tpu.config import RenderConfig
    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.viewer.viewer import Viewer

    model = GaussianModel.random(jax.random.PRNGKey(0), 50, sh_degree=0)
    return Viewer(model, RenderConfig(backend="jnp_tile"), width=64, height=48, **kw)


def test_viewer_composites_grid_axes_overlay():
    v = _tiny_viewer()
    with_overlay = v.render_frame()
    v.show_overlay = False
    without = v.render_frame()
    # the grid/axes must actually appear in the frame
    assert (with_overlay != without).any()
    # and the clear color shows where nothing is drawn (reference clear
    # 0.1,0.1,0.15 → uint8 ~26,26,38)
    corner = without[0, 0]
    assert abs(int(corner[2]) - 38) <= 2 and abs(int(corner[0]) - 26) <= 2


def test_viewer_resize():
    v = _tiny_viewer()
    v.resize(96, 64)
    frame = v.render_frame()
    assert frame.shape == (64, 96, 3)
    assert v.metrics()["resolution"] == [96, 64]


def test_viewer_hot_reload_polls():
    v = _tiny_viewer(hot_reload=True)
    assert v._reloader is not None
    f1 = v.render_frame()  # polls mtime (no change → same fn)
    fn_before = v._render_jit
    f2 = v.render_frame()
    assert v._render_jit is fn_before
    assert f1.shape == f2.shape


def test_lod_subset_and_interactive_switch():
    import time
    import jax
    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.config import RenderConfig
    from gaussian_splat_tpu.viewer.viewer import Viewer

    model = GaussianModel.random(jax.random.PRNGKey(0), 64, sh_degree=0)
    sub = model.lod(0.25)
    assert sub.num_gaussians == 16
    # the subset is the top-impact splats: its min impact >= the full set's median
    import numpy as np
    op = lambda m: 1.0 / (1.0 + np.exp(-np.asarray(m.opacity_logits)))
    sm = lambda m: np.exp(np.asarray(m.log_scales)).max(-1)
    imp_all = np.sort(op(model) * sm(model) ** 2)
    imp_sub = op(sub) * sm(sub) ** 2
    assert imp_sub.min() >= imp_all[len(imp_all) // 2]

    v = Viewer(model, RenderConfig(backend="jnp_tile"), width=64, height=48,
               show_overlay=False, lod_fraction=0.25)
    full = v.render_frame()
    v._interacting_until = time.monotonic() + 5.0
    lod = v.render_frame()
    assert full.shape == lod.shape
    assert (full != lod).any()  # the degraded frame differs


def test_lod_pair_budget_bounds_pairs():
    """The pair-budget subset's measured pair cost respects the budget, and
    the rendered pair count (σ-test only removes pairs) stays under it too."""
    import jax
    import numpy as np
    from gaussian_splat_tpu.camera import Camera
    from gaussian_splat_tpu.config import RenderConfig
    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.ops.render import measure_pair_costs

    model = GaussianModel.random(
        jax.random.PRNGKey(3), 256, sh_degree=0, scale_range=(0.02, 0.3)
    )
    cam = Camera.from_lookat(
        (0.0, 2.0, 5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 45.0, 128, 96
    )
    cfg = RenderConfig(backend="jnp_tile")
    costs = np.asarray(measure_pair_costs(model, cam, cfg))
    assert costs.shape == (256,) and costs.sum() > 0

    frac = 0.3
    sub = model.lod_pair_budget(frac, costs)
    assert 1 <= sub.num_gaussians < model.num_gaussians
    # re-measure the subset at the same camera: identical per-splat rects
    # (subsetting changes nothing per splat), so the budget must hold
    sub_costs = np.asarray(measure_pair_costs(sub, cam, cfg))
    # knapsack charges max(cost, 1) per splat, so the bound is against the
    # clamped total; measured areas are <= the charged costs
    assert sub_costs.sum() <= frac * np.maximum(costs, 1).sum() + 1e-6

    # the heuristic (view-free) fallback also returns a nonempty strict subset
    sub2 = model.lod_pair_budget(frac)
    assert 1 <= sub2.num_gaussians < model.num_gaussians


def test_lod_pair_budget_viewer_switch():
    import time
    import jax
    from gaussian_splat_tpu.config import RenderConfig
    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.viewer.viewer import Viewer

    model = GaussianModel.random(
        jax.random.PRNGKey(4), 64, sh_degree=0, scale_range=(0.02, 0.3)
    )
    v = Viewer(model, RenderConfig(backend="jnp_tile"), width=64, height=48,
               show_overlay=False, lod_pair_budget=0.3)
    assert v._model_lod is not None
    assert v._model_lod.num_gaussians < model.num_gaussians
    full = v.render_frame()
    v._interacting_until = time.monotonic() + 5.0
    lod = v.render_frame()
    assert full.shape == lod.shape
    assert (full != lod).any()
