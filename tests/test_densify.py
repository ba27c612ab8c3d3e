"""Adaptive density control: fixed-N slot redistribution semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.train.densify import (
    DensifyState,
    densify_step,
    init_densify_state,
    reset_opacity,
    reset_opt_rows,
    update_scores,
)


def _model(n=100, seed=0):
    return GaussianModel.random(jax.random.PRNGKey(seed), n, sh_degree=0)


def test_score_ema():
    s = init_densify_state(10)
    g = jnp.ones((10, 3))
    s = update_scores(s, g)
    np.testing.assert_allclose(s.grad_score, 0.1 * np.sqrt(3), rtol=1e-5)
    s = update_scores(s, g)
    assert float(s.grad_score[0]) > 0.1 * np.sqrt(3)


def test_densify_respawns_low_opacity_at_high_grad():
    model = _model(100)
    # slot 7: nearly dead; slot 42: high gradient signal
    model = model.replace(
        opacity_logits=model.opacity_logits.at[7].set(-10.0).at[42].set(2.0)
    )
    state = init_densify_state(100)
    state = state._replace(grad_score=state.grad_score.at[42].set(5.0))

    new_model, new_state, respawned = densify_step(
        model, state, jax.random.PRNGKey(1), victim_fraction=0.01
    )
    assert bool(respawned[7]) and bool(respawned[42])
    # victim slot respawned near the donor, with shrunk scale
    d = np.linalg.norm(np.asarray(new_model.means[7] - model.means[42]))
    donor_scale = float(np.exp(model.log_scales[42]).max())
    assert d < 5 * donor_scale
    np.testing.assert_allclose(
        new_model.log_scales[7], model.log_scales[42] - np.log(1.6), rtol=1e-5
    )
    # donor also shrinks (split), keeps position
    np.testing.assert_allclose(new_model.means[42], model.means[42])
    np.testing.assert_allclose(
        new_model.log_scales[42], model.log_scales[42] - np.log(1.6), rtol=1e-5
    )
    # N unchanged, scores reset on touched slots
    assert new_model.num_gaussians == 100
    assert float(new_state.grad_score[42]) == 0.0


def test_untouched_slots_preserved():
    model = _model(50)
    state = init_densify_state(50)
    state = state._replace(grad_score=jnp.arange(50.0))
    new_model, _, respawned = densify_step(
        model, state, jax.random.PRNGKey(2), victim_fraction=0.02
    )
    untouched = ~np.asarray(respawned)
    np.testing.assert_allclose(
        np.asarray(new_model.means)[untouched], np.asarray(model.means)[untouched]
    )


def test_reset_opacity_ceiling():
    model = _model(20)
    out = reset_opacity(model, 0.01)
    assert float(np.asarray(out.opacities).max()) <= 0.01 + 1e-6
    # already-low opacities unchanged
    low = np.asarray(model.opacities) < 0.01
    if low.any():
        np.testing.assert_allclose(
            np.asarray(out.opacity_logits)[low],
            np.asarray(model.opacity_logits)[low],
        )


def test_reset_opt_rows():
    import optax

    from gaussian_splat_tpu.config import TrainConfig
    from gaussian_splat_tpu.train.trainer import make_optimizer

    model = _model(30)
    tx = make_optimizer(TrainConfig())
    opt = tx.init(model)
    # one update to make moments nonzero
    grads = jax.tree_util.tree_map(jnp.ones_like, model)
    updates, opt = tx.update(grads, opt, model)

    mask = jnp.zeros(30, bool).at[3].set(True)
    opt2 = reset_opt_rows(opt, mask)
    for leaf in jax.tree_util.tree_leaves(opt2):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == 30:
            assert float(jnp.abs(leaf[3]).max()) == 0.0
            assert float(jnp.abs(leaf[4]).max()) > 0.0  # untouched row intact


def test_densify_jits():
    model = _model(64)
    state = init_densify_state(64)
    fn = jax.jit(
        lambda m, s, k: densify_step(m, s, k, victim_fraction=0.05)[0].means
    )
    a = fn(model, state, jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(a)))


def test_fit_multiview_adc_end_to_end():
    """ADC training loop runs and reduces loss on a synthetic dataset."""
    from gaussian_splat_tpu.config import RenderConfig, TrainConfig
    from gaussian_splat_tpu.ops.render import render
    from gaussian_splat_tpu.train.dataset import orbit_dataset
    from gaussian_splat_tpu.train.trainer import fit_multiview_adc

    cfg = RenderConfig(backend="jnp_tile")
    gt = GaussianModel.random(jax.random.PRNGKey(5), 40, sh_degree=0, extent=0.7)
    ds = orbit_dataset(lambda cam: render(gt, cam, cfg).image, n_views=3,
                       radius=4.0, width=40, height=40)
    init = gt.replace(opacity_logits=gt.opacity_logits - 1.0)
    fitted, hist = fit_multiview_adc(
        init, ds, cfg,
        TrainConfig(num_steps=60, ssim_weight=0.0, lr_opacities=0.1),
        densify_every=20, opacity_reset_every=0, victim_fraction=0.05,
        log_every=15,
    )
    assert fitted.num_gaussians == 40
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0]
