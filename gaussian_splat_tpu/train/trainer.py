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
    """Per-group Adam (3DGS convention: position lr ≪ opacity lr), with the
    3DGS exponential position-lr decay: lr(t) log-linearly interpolates from
    `lr_means` to `lr_means_final` over `lr_decay_steps` (default: the 3DGS
    30 000-iteration horizon, independent of num_steps — short fits shouldn't
    freeze positions)."""
    decay_steps = tc.lr_decay_steps or 30_000
    if tc.lr_means_final and tc.lr_means_final != tc.lr_means:
        means_lr = optax.exponential_decay(
            init_value=tc.lr_means,
            transition_steps=decay_steps,
            decay_rate=tc.lr_means_final / tc.lr_means,
            staircase=False,
            end_value=tc.lr_means_final,
        )
    else:
        means_lr = tc.lr_means
    tx = optax.multi_transform(
        {
            "means": optax.adam(means_lr),
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


def _sh_band_of_coeff(num_coeffs: int):
    """Static per-coefficient SH band indices: coeff k of a degree-d basis has
    band ⌈√(k+1)⌉−1 (1, 3, 5, 7 coeffs for bands 0-3)."""
    import numpy as np

    k = np.arange(num_coeffs)
    return jnp.asarray(np.ceil(np.sqrt(k + 1)) - 1, jnp.int32)


def apply_sh_warmup(model: GaussianModel, step: jax.Array, tc: TrainConfig) -> GaussianModel:
    """3DGS SH warmup: only bands ≤ step // sh_warmup_every are active.

    Zeroing the inactive bands' coefficients inside the jitted step is
    image-equivalent to lowering the eval degree, but keeps every shape and
    static argument fixed — one compilation for the whole schedule."""
    if not tc.sh_warmup_every:
        return model
    active = step // tc.sh_warmup_every
    bands = _sh_band_of_coeff(model.sh.shape[1])  # (K,)
    mask = (bands <= active).astype(model.sh.dtype)[None, :, None]
    return model.replace(sh=model.sh * mask)


class TrainState(NamedTuple):
    model: GaussianModel
    opt_state: optax.OptState
    step: jax.Array


def create_train_state(model: GaussianModel, tc: TrainConfig) -> TrainState:
    tx = make_optimizer(tc)
    # copy the leaves: train steps donate the state, and donation must never
    # invalidate the caller's model buffers
    model = jax.tree_util.tree_map(jnp.array, model)
    return TrainState(model=model, opt_state=tx.init(model), step=jnp.int32(0))


def make_train_step(
    camera: Camera,
    render_config: RenderConfig,
    train_config: TrainConfig,
    mesh=None,
    axis_name: str = "dev",
    donate: bool = True,
):
    """Build a jitted train step. With `mesh`, rendering runs sharded
    (splat+tile parallel) and the loss/optimizer run under SPMD on the
    row-sharded image.

    The returned step runs `train_config.steps_per_dispatch` scanned steps per
    call with the state donated (donate=True): host↔device round-trips
    amortize across K steps and the model/optimizer buffers update in place
    instead of being copied every step. Pass donate=False if a caller must
    reuse a state object after stepping it. Returns (state, loss of the last
    scanned step)."""
    tx = make_optimizer(train_config)
    K = max(1, train_config.steps_per_dispatch)

    if mesh is not None:
        from gaussian_splat_tpu.parallel.sharded_render import render_sharded

        def render_image(model):
            return render_sharded(model, camera, render_config, mesh, axis_name).image

    else:

        def render_image(model):
            return render(model, camera, render_config).image

    def loss_fn(model, step, target):
        img = render_image(apply_sh_warmup(model, step, train_config))
        return photometric_loss(img, target, train_config.ssim_weight)

    def one_step(state: TrainState, target) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.model, state.step, target)
        updates, opt_state = tx.update(grads, state.opt_state, state.model)
        model = optax.apply_updates(state.model, updates)
        return TrainState(model=model, opt_state=opt_state, step=state.step + 1), loss

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, target: jax.Array) -> Tuple[TrainState, jax.Array]:
        if K == 1:
            return one_step(state, target)
        state, losses = jax.lax.scan(
            lambda s, _: one_step(s, target), state, length=K
        )
        return state, losses[-1]

    return train_step


def make_multiview_train_step(
    dataset,
    render_config: RenderConfig,
    train_config: TrainConfig,
    mesh=None,
    axis_name: str = "dev",
    donate: bool = True,
):
    """Jitted multi-view step: the view index is a traced argument, so cycling
    or randomizing views does NOT retrigger compilation. With
    steps_per_dispatch K > 1, pass a (K,) array of view indices per call (the
    K steps scan on-device). With `mesh`, each view renders sharded."""
    tx = make_optimizer(train_config)
    K = max(1, train_config.steps_per_dispatch)

    if mesh is not None:
        from gaussian_splat_tpu.parallel.sharded_render import render_sharded

        def render_image(model, cam):
            return render_sharded(model, cam, render_config, mesh, axis_name).image

    else:

        def render_image(model, cam):
            return render(model, cam, render_config).image

    def loss_fn(model, step, view_idx):
        cam = dataset.camera(view_idx)
        img = render_image(apply_sh_warmup(model, step, train_config), cam)
        return photometric_loss(
            img, dataset.target(view_idx), train_config.ssim_weight
        )

    def one_step(state: TrainState, view_idx) -> Tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(loss_fn)(state.model, state.step, view_idx)
        updates, opt_state = tx.update(grads, state.opt_state, state.model)
        model = optax.apply_updates(state.model, updates)
        return TrainState(model=model, opt_state=opt_state, step=state.step + 1), loss

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, view_idx) -> Tuple[TrainState, jax.Array]:
        if K == 1:
            return one_step(state, view_idx)
        state, losses = jax.lax.scan(one_step, state, view_idx)  # (K,) views
        return state, losses[-1]

    return train_step


class AdcTrainState(NamedTuple):
    """Train state with adaptive-density-control bookkeeping."""

    model: GaussianModel
    opt_state: optax.OptState
    step: jax.Array
    densify: "object"  # DensifyState
    key_splits: jax.Array = None  # () int32: jax.random.split calls consumed
    #   by densify so far — persisted so resume replays the EXACT key stream
    #   even if densify_every/num_steps change between invocations (advisor
    #   finding, round 4: re-deriving the count from current hyperparams
    #   silently desyncs the stream)


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
    resume: bool = False,
) -> Tuple[GaussianModel, list]:
    """Multi-view fit with 3DGS-style adaptive density control at fixed N
    (slot redistribution — see train/densify.py).

    Checkpointing: with `train_config.checkpoint_dir` set, the full
    AdcTrainState (model + optimizer moments + densify scores + step) is
    Orbax-saved every `checkpoint_every` steps; `resume=True` restores the
    latest checkpoint and continues from its step (the PLY remains the
    interchange/export format — SURVEY §5 checkpoint/resume)."""
    import numpy as np

    from gaussian_splat_tpu.train import densify as adc

    tx = make_optimizer(train_config)
    dstate = adc.init_densify_state(model.num_gaussians)
    densify_until = densify_until or int(train_config.num_steps * 0.8)

    def loss_fn(m, screen_off, view_idx):
        cam = dataset.camera(view_idx)
        img = render(m, cam, render_config, screen_offset=screen_off).image
        return photometric_loss(img, dataset.target(view_idx), train_config.ssim_weight)

    @jax.jit
    def train_step(state: AdcTrainState, view_idx):
        # differentiate w.r.t. a zero screen-space offset to get the TRUE 3DGS
        # densify criterion — ‖∂L/∂means2d‖ in pixels — alongside the param grads
        off = jnp.zeros((state.model.means.shape[0], 2))
        loss, (grads, g_screen) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            state.model, off, view_idx
        )
        d = adc.update_scores(state.densify, g_screen)
        updates, opt_state = tx.update(grads, state.opt_state, state.model)
        m = optax.apply_updates(state.model, updates)
        return (
            AdcTrainState(m, opt_state, state.step + 1, d, state.key_splits),
            loss,
        )

    @jax.jit
    def densify_jit(state: AdcTrainState, key):
        m, d, respawned = adc.densify_step(
            state.model, state.densify, key, victim_fraction=victim_fraction
        )
        opt_state = adc.reset_opt_rows(state.opt_state, respawned)
        return AdcTrainState(
            m, opt_state, state.step, d, state.key_splits + 1
        )

    @jax.jit
    def opacity_reset_jit(state: AdcTrainState):
        return state._replace(model=adc.reset_opacity(state.model))

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    state = AdcTrainState(
        model, tx.init(model), jnp.int32(0), dstate, jnp.int32(0)
    )
    start = 0
    if resume and train_config.checkpoint_dir:
        from gaussian_splat_tpu.train.checkpoint import restore_checkpoint

        restored = restore_checkpoint(train_config.checkpoint_dir, state)
        if restored is not None:
            state = restored
            start = int(state.step)
            # keep the view/densify RNG streams aligned with the fresh run:
            # one view draw per step, and the PERSISTED split count (not a
            # re-derivation from the current densify_every/densify_until,
            # which silently desyncs when hyperparameters change between
            # invocations — advisor finding, round 4)
            rng = np.random.default_rng(seed)
            _ = rng.integers(dataset.num_views, size=start)
            for _ in range(int(state.key_splits)):
                key, _ = jax.random.split(key)
    history = []
    for i in range(start, train_config.num_steps):
        view = int(rng.integers(dataset.num_views))
        state, loss = train_step(state, jnp.int32(view))
        if 0 < i <= densify_until and i % densify_every == 0:
            key, sub = jax.random.split(key)
            state = densify_jit(state, sub)
        if opacity_reset_every and 0 < i <= densify_until and i % opacity_reset_every == 0:
            state = opacity_reset_jit(state)
        if i % log_every == 0 or i == train_config.num_steps - 1:
            history.append(float(loss))
        if (
            train_config.checkpoint_dir
            and train_config.checkpoint_every
            and i > 0
            and (i + 1) % train_config.checkpoint_every == 0
        ):
            from gaussian_splat_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(train_config.checkpoint_dir, state)
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
    K = max(1, train_config.steps_per_dispatch)
    history = []
    for i in range(0, train_config.num_steps, K):
        if K == 1:
            views = jnp.int32(int(rng.integers(dataset.num_views)))
        else:
            views = jnp.asarray(
                rng.integers(dataset.num_views, size=K), jnp.int32
            )
        state, loss = step_fn(state, views)
        if (i // K) % max(1, log_every // K) == 0 or i + K >= train_config.num_steps:
            history.append(float(loss))
            if callback is not None:
                callback(i, float(loss), state)
        if (
            train_config.checkpoint_dir
            and train_config.checkpoint_every
            and (i + K) % train_config.checkpoint_every < K
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
    K = max(1, train_config.steps_per_dispatch)
    history = []
    for i in range(0, train_config.num_steps, K):
        state, loss = step_fn(state, target)
        if (i // K) % max(1, log_every // K) == 0 or i + K >= train_config.num_steps:
            history.append(float(loss))
            if callback is not None:
                callback(i, float(loss), state)
        if (
            train_config.checkpoint_dir
            and train_config.checkpoint_every
            and (i + K) % train_config.checkpoint_every < K
        ):
            from gaussian_splat_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(train_config.checkpoint_dir, state)
    return state.model, history
