"""Oracle rasterizer tests: analytic semantics + finite-difference gradient
checks on synthetic scenes (north-star config 1: CPU jax fwd+bwd vs finite-diff)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops.render import render


def _camera(width=64, height=64):
    return Camera.from_lookat(
        eye=(0.0, 0.0, -4.0),
        target=(0.0, 0.0, 0.0),
        up=(0.0, 1.0, 0.0),
        fov_y_deg=60.0,
        width=width,
        height=height,
    )


CFG = RenderConfig(backend="reference")


def test_single_gaussian_peak_at_center():
    cam = _camera()
    model = GaussianModel.create(
        means=[[0.0, 0.0, 0.0]],
        quats=[[1.0, 0.0, 0.0, 0.0]],
        log_scales=[[np.log(0.3)] * 3],
        opacity_logits=[4.0],  # sigmoid ≈ 0.982
        sh=[[[1.0, 1.0, 1.0]]],
    )
    out = render(model, cam, CFG)
    img = np.asarray(out.image)
    assert img.shape == (64, 64, 3)
    # brightest pixel should be one of the 4 center pixels (center falls on the
    # pixel-corner 32.0, between pixel centers 31.5 and 32.5)
    idx = np.unravel_index(np.argmax(img[..., 0]), (64, 64))
    assert idx[0] in (31, 32) and idx[1] in (31, 32)
    # alpha peaks in the middle, near the opacity value
    assert 0.9 < np.asarray(out.alpha)[idx] <= 1.0
    # corners are background (black)
    assert img[0, 0].max() < 1e-3


def test_empty_scene_is_background():
    cam = _camera(32, 32)
    model = GaussianModel.create(
        means=[[0.0, 0.0, -100.0]],  # behind camera
        quats=[[1.0, 0.0, 0.0, 0.0]],
        log_scales=[[np.log(0.1)] * 3],
        opacity_logits=[0.0],
        sh=[[[0.0, 0.0, 0.0]]],
    )
    cfg = RenderConfig(backend="reference", background=(0.25, 0.5, 0.75))
    out = render(model, cam, cfg)
    img = np.asarray(out.image)
    np.testing.assert_allclose(img, np.broadcast_to([0.25, 0.5, 0.75], img.shape), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)


def test_occlusion_order():
    """A near opaque red splat must occlude a far green one regardless of input
    order — the gsplat near-first semantics the reference's 50-layer mode gets
    wrong (SURVEY §7)."""
    cam = _camera()

    def scene(order):
        reds = {
            "means": [0.0, 0.0, -1.0],  # nearer to the eye at z=-4
            "sh": [[10.0, -10.0, -10.0]],
            "op": 10.0,
        }
        greens = {
            "means": [0.0, 0.0, 1.0],
            "sh": [[-10.0, 10.0, -10.0]],
            "op": 10.0,
        }
        items = [reds, greens] if order == 0 else [greens, reds]
        return GaussianModel.create(
            means=[i["means"] for i in items],
            quats=[[1.0, 0.0, 0.0, 0.0]] * 2,
            log_scales=[[np.log(0.5)] * 3] * 2,
            opacity_logits=[i["op"] for i in items],
            sh=[i["sh"] for i in items],
        )

    img0 = np.asarray(render(scene(0), cam, CFG).image)
    img1 = np.asarray(render(scene(1), cam, CFG).image)
    np.testing.assert_allclose(img0, img1, atol=1e-5)
    center = img0[32, 32]
    assert center[0] > 5 * max(center[1], 1e-6)  # red wins


def test_transmittance_saturation():
    """Stacking many opaque splats saturates alpha toward 1."""
    cam = _camera(32, 32)
    n = 20
    model = GaussianModel.create(
        means=[[0.0, 0.0, 0.1 * i] for i in range(n)],
        quats=[[1.0, 0.0, 0.0, 0.0]] * n,
        log_scales=[[np.log(0.5)] * 3] * n,
        opacity_logits=[2.0] * n,
        sh=[[[0.5, 0.5, 0.5]]] * n,
    )
    out = render(model, cam, CFG)
    assert np.asarray(out.alpha)[16, 16] > 0.999


@pytest.mark.parametrize("leaf", ["means", "log_scales", "opacity_logits", "sh", "quats"])
def test_finite_difference_gradients(leaf):
    """Config 1: fwd+bwd vs central finite differences, per parameter leaf."""
    key = jax.random.PRNGKey(7)
    cam = _camera(32, 32)
    model = GaussianModel.random(key, 30, sh_degree=1, extent=0.8, isotropic=False)
    target = jax.random.uniform(jax.random.fold_in(key, 9), (32, 32, 3))

    def loss_fn(m):
        out = render(m, cam, CFG)
        return jnp.mean((out.image - target) ** 2)

    grads = jax.grad(loss_fn)(model)
    g = np.asarray(getattr(grads, leaf))
    assert np.all(np.isfinite(g))

    # central differences on a handful of coordinates
    rng = np.random.default_rng(0)
    base = np.asarray(getattr(model, leaf))
    flat = base.reshape(-1)
    eps = 3e-4
    checked = 0
    for idx in rng.choice(flat.size, size=min(8, flat.size), replace=False):
        pert = np.zeros_like(flat)
        pert[idx] = eps
        pert = pert.reshape(base.shape)
        lp = float(loss_fn(model.replace(**{leaf: jnp.asarray(base + pert)})))
        lm = float(loss_fn(model.replace(**{leaf: jnp.asarray(base - pert)})))
        fd = (lp - lm) / (2 * eps)
        an = g.reshape(-1)[idx]
        # tolerant: compositing has kinks (alpha_skip / clamp thresholds)
        assert abs(fd - an) < 5e-3 + 0.05 * max(abs(fd), abs(an)), (
            f"{leaf}[{idx}]: fd={fd:.6g} analytic={an:.6g}"
        )
        checked += 1
    assert checked > 0


def test_1k_isotropic_scene_renders():
    """Config 1 scale point: 1k isotropic gaussians, 256×256, fwd+bwd run clean."""
    key = jax.random.PRNGKey(11)
    cam = _camera(256, 256)
    model = GaussianModel.random(key, 1000, sh_degree=0, extent=1.5, isotropic=True)

    out = render(model, cam, CFG)
    img = np.asarray(out.image)
    assert np.all(np.isfinite(img))
    assert img.max() > 0.05  # something rendered

    def loss_fn(m):
        return jnp.mean(render(m, cam, CFG).image ** 2)

    grads = jax.grad(loss_fn)(model)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
