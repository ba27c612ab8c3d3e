"""Training loop: loss sanity, single-image fit convergence, checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.config import RenderConfig, TrainConfig
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops.render import render
from gaussian_splat_tpu.train.loss import l1, photometric_loss, ssim
from gaussian_splat_tpu.train.trainer import (
    create_train_state,
    fit,
    make_train_step,
)


def test_ssim_identity_is_one():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert float(ssim(img, img)) > 0.9999


def test_ssim_decreases_with_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    noisy = img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
    assert float(ssim(img, noisy)) < float(ssim(img, img))


def test_photometric_loss_zero_at_identity():
    img = jax.random.uniform(jax.random.PRNGKey(2), (32, 32, 3))
    assert abs(float(photometric_loss(img, img))) < 1e-5
    assert float(photometric_loss(img, jnp.zeros_like(img))) > 0.01


def test_train_step_reduces_loss():
    cam = Camera.from_lookat((0, 0, -4), (0, 0, 0), (0, 1, 0), 60.0, 64, 64)
    cfg = RenderConfig(backend="jnp_tile")
    # target: render of a "ground truth" scene
    gt = GaussianModel.random(jax.random.PRNGKey(0), 40, sh_degree=0, extent=0.8)
    target = render(gt, cam, cfg).image
    # init: perturbed copy
    init = gt.replace(
        means=gt.means + 0.05 * jax.random.normal(jax.random.PRNGKey(1), gt.means.shape),
        opacity_logits=gt.opacity_logits - 0.5,
    )
    tc = TrainConfig(num_steps=30, ssim_weight=0.2)
    state = create_train_state(init, tc)
    step = make_train_step(cam, cfg, tc)
    _, loss0 = step(state, target)
    for _ in range(30):
        state, loss = step(state, target)
    assert float(loss) < float(loss0) * 0.8, (float(loss0), float(loss))


def test_fit_api():
    cam = Camera.from_lookat((0, 0, -4), (0, 0, 0), (0, 1, 0), 60.0, 48, 48)
    cfg = RenderConfig(backend="jnp_tile")
    gt = GaussianModel.random(jax.random.PRNGKey(3), 20, sh_degree=0, extent=0.6)
    target = render(gt, cam, cfg).image
    model = gt.replace(opacity_logits=gt.opacity_logits - 1.0)
    fitted, history = fit(
        model, cam, target, cfg, TrainConfig(num_steps=20, ssim_weight=0.0),
        log_every=5,
    )
    assert len(history) >= 2
    assert history[-1] < history[0]


def test_checkpoint_roundtrip(tmp_path):
    from gaussian_splat_tpu.train.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    model = GaussianModel.random(jax.random.PRNGKey(4), 16, sh_degree=0)
    tc = TrainConfig()
    state = create_train_state(model, tc)
    state = state._replace(step=jnp.int32(7))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state)
    assert latest_step(d) == 7
    restored = restore_checkpoint(d, state)
    assert int(restored.step) == 7
    np.testing.assert_allclose(restored.model.means, state.model.means)
    # optimizer state restored too
    leaves_a = jax.tree_util.tree_leaves(restored.opt_state)
    leaves_b = jax.tree_util.tree_leaves(state.opt_state)
    assert len(leaves_a) == len(leaves_b)
