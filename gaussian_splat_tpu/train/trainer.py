"""Training loop: per-leaf optimizers, jitted train step, sharded variant.

North-star config 5 ("training-step loop"). The reference is forward-only; the
training machinery follows standard 3DGS practice: separate Adam learning rates
per parameter group (means/quats/scales/opacities/SH) via `optax.multi_transform`,
L1+SSIM photometric loss, and gradients that flow through the Pallas rasterizer's
custom VJP, the pair gather (→ scatter-add), and the projection/SH chain.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.config import RenderConfig, TrainConfig
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops.render import render
from gaussian_splat_tpu.train.loss import photometric_loss


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """Per-group Adam (3DGS convention: position lr ≪ opacity lr)."""
    tx = optax.multi_transform(
        {
            "means": optax.adam(tc.lr_means),
            "quats": optax.adam(tc.lr_quats),
            "log_scales": optax.adam(tc.lr_scales),
            "opacity_logits": optax.adam(tc.lr_opacities),
            "sh": optax.adam(tc.lr_sh),
        },
        GaussianModel(
            means="means",
            quats="quats",
            log_scales="log_scales",
            opacity_logits="opacity_logits",
            sh="sh",
        ),
    )
    return tx


class TrainState(NamedTuple):
    model: GaussianModel
    opt_state: optax.OptState
    step: jax.Array


def create_train_state(model: GaussianModel, tc: TrainConfig) -> TrainState:
    tx = make_optimizer(tc)
    return TrainState(model=model, opt_state=tx.init(model), step=jnp.int32(0))


def make_train_step(
    camera: Camera,
    render_config: RenderConfig,
    train_config: TrainConfig,
    mesh=None,
    axis_name: str = "dev",
):
    """Build a jitted train step. With `mesh`, rendering runs sharded
    (splat+tile parallel) and the loss/optimizer run under SPMD on the
    row-sharded image."""
    tx = make_optimizer(train_config)

    if mesh is not None:
        from gaussian_splat_tpu.parallel.sharded_render import render_sharded

        def render_image(model):
            img, _, _ = render_sharded(model, camera, render_config, mesh, axis_name)
            return img

    else:

        def render_image(model):
            return render(model, camera, render_config).image

    def loss_fn(model, target):
        img = render_image(model)
        return photometric_loss(img, target, train_config.ssim_weight)

    @jax.jit
    def train_step(state: TrainState, target: jax.Array) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.model, target)
        updates, opt_state = tx.update(grads, state.opt_state, state.model)
        model = optax.apply_updates(state.model, updates)
        return TrainState(model=model, opt_state=opt_state, step=state.step + 1), loss

    return train_step


def make_multiview_train_step(
    dataset,
    render_config: RenderConfig,
    train_config: TrainConfig,
):
    """Jitted multi-view step: the view index is a traced argument, so cycling
    or randomizing views does NOT retrigger compilation."""
    tx = make_optimizer(train_config)

    def loss_fn(model, view_idx):
        cam = dataset.camera(view_idx)
        img = render(model, cam, render_config).image
        return photometric_loss(
            img, dataset.target(view_idx), train_config.ssim_weight
        )

    @jax.jit
    def train_step(state: TrainState, view_idx) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.model, view_idx)
        updates, opt_state = tx.update(grads, state.opt_state, state.model)
        model = optax.apply_updates(state.model, updates)
        return TrainState(model=model, opt_state=opt_state, step=state.step + 1), loss

    return train_step


class AdcTrainState(NamedTuple):
    """Train state with adaptive-density-control bookkeeping."""

    model: GaussianModel
    opt_state: optax.OptState
    step: jax.Array
    densify: "object"  # DensifyState


def fit_multiview_adc(
    model: GaussianModel,
    dataset,
    render_config: RenderConfig = RenderConfig(),
    train_config: TrainConfig = TrainConfig(),
    *,
    densify_every: int = 100,
    densify_until: Optional[int] = None,
    opacity_reset_every: int = 500,
    victim_fraction: float = 0.05,
    seed: int = 0,
    log_every: int = 100,
) -> Tuple[GaussianModel, list]:
    """Multi-view fit with 3DGS-style adaptive density control at fixed N
    (slot redistribution — see train/densify.py)."""
    import numpy as np

    from gaussian_splat_tpu.train import densify as adc

    tx = make_optimizer(train_config)
    dstate = adc.init_densify_state(model.num_gaussians)
    densify_until = densify_until or int(train_config.num_steps * 0.8)

    def loss_fn(m, view_idx):
        cam = dataset.camera(view_idx)
        img = render(m, cam, render_config).image
        return photometric_loss(img, dataset.target(view_idx), train_config.ssim_weight)

    @jax.jit
    def train_step(state: AdcTrainState, view_idx):
        loss, grads = jax.value_and_grad(loss_fn)(state.model, view_idx)
        d = adc.update_scores(state.densify, grads.means)
        updates, opt_state = tx.update(grads, state.opt_state, state.model)
        m = optax.apply_updates(state.model, updates)
        return AdcTrainState(m, opt_state, state.step + 1, d), loss

    @jax.jit
    def densify_jit(state: AdcTrainState, key):
        m, d, respawned = adc.densify_step(
            state.model, state.densify, key, victim_fraction=victim_fraction
        )
        opt_state = adc.reset_opt_rows(state.opt_state, respawned)
        return AdcTrainState(m, opt_state, state.step, d)

    @jax.jit
    def opacity_reset_jit(state: AdcTrainState):
        return state._replace(model=adc.reset_opacity(state.model))

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    state = AdcTrainState(model, tx.init(model), jnp.int32(0), dstate)
    history = []
    for i in range(train_config.num_steps):
        view = int(rng.integers(dataset.num_views))
        state, loss = train_step(state, jnp.int32(view))
        if 0 < i <= densify_until and i % densify_every == 0:
            key, sub = jax.random.split(key)
            state = densify_jit(state, sub)
        if opacity_reset_every and 0 < i <= densify_until and i % opacity_reset_every == 0:
            state = opacity_reset_jit(state)
        if i % log_every == 0 or i == train_config.num_steps - 1:
            history.append(float(loss))
    return state.model, history


def fit_multiview(
    model: GaussianModel,
    dataset,
    render_config: RenderConfig = RenderConfig(),
    train_config: TrainConfig = TrainConfig(),
    seed: int = 0,
    log_every: int = 100,
    callback=None,
) -> Tuple[GaussianModel, list]:
    """Fit to a multi-view dataset with random view sampling per step."""
    import numpy as np

    rng = np.random.default_rng(seed)
    state = create_train_state(model, train_config)
    step_fn = make_multiview_train_step(dataset, render_config, train_config)
    history = []
    for i in range(train_config.num_steps):
        view = int(rng.integers(dataset.num_views))
        state, loss = step_fn(state, jnp.int32(view))
        if i % log_every == 0 or i == train_config.num_steps - 1:
            history.append(float(loss))
            if callback is not None:
                callback(i, float(loss), state)
        if (
            train_config.checkpoint_dir
            and train_config.checkpoint_every
            and (i + 1) % train_config.checkpoint_every == 0
        ):
            from gaussian_splat_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(train_config.checkpoint_dir, state)
    return state.model, history


def fit(
    model: GaussianModel,
    camera: Camera,
    target: jax.Array,
    render_config: RenderConfig = RenderConfig(),
    train_config: TrainConfig = TrainConfig(),
    mesh=None,
    log_every: int = 100,
    callback=None,
) -> Tuple[GaussianModel, list]:
    """Fit a model to a single target image. Returns (model, loss history)."""
    state = create_train_state(model, train_config)
    step_fn = make_train_step(camera, render_config, train_config, mesh)
    history = []
    for i in range(train_config.num_steps):
        state, loss = step_fn(state, target)
        if i % log_every == 0 or i == train_config.num_steps - 1:
            history.append(float(loss))
            if callback is not None:
                callback(i, float(loss), state)
        if (
            train_config.checkpoint_dir
            and train_config.checkpoint_every
            and (i + 1) % train_config.checkpoint_every == 0
        ):
            from gaussian_splat_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(train_config.checkpoint_dir, state)
    return state.model, history
