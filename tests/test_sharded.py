"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded render
matches single-chip output to f32-association noise; sharded train step runs;
grads match the single-chip path.

Bands render in GLOBAL pixel coordinates (round 4), so every per-pixel alpha
is bit-identical to single-chip; the only remaining difference is compositing
ASSOCIATION (per-tile segments sit at different positions in the per-band
pair array, so log-space prefix sums group differently) — measured max
1.2e-6 on these scenes, vs alpha*3e-4 with the round-3 band-local
coordinates. Tolerances here assert that exactness level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splat_tpu.camera import Camera
from gaussian_splat_tpu.config import RenderConfig, TrainConfig
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops.render import render
from gaussian_splat_tpu.parallel.mesh import make_mesh, shard_model
from gaussian_splat_tpu.parallel.sharded_render import render_sharded
from gaussian_splat_tpu.train.loss import photometric_loss
from gaussian_splat_tpu.train.trainer import create_train_state, make_train_step


def _setup(n=256, width=128, height=128, seed=0):
    cam = Camera.from_lookat((0, 0, -4), (0, 0, 0), (0, 1, 0), 60.0, width, height)
    model = GaussianModel.random(
        jax.random.PRNGKey(seed), n, sh_degree=1, extent=1.2, scale_range=(0.02, 0.1)
    )
    return cam, model


CFG = RenderConfig(backend="jnp_tile")


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_matches_single_chip(ndev):
    cam, model = _setup()
    mesh = make_mesh(ndev)
    img_single = render(model, cam, CFG).image
    img_sharded = render_sharded(shard_model(model, mesh), cam, CFG, mesh).image
    assert img_sharded.shape == (128, 128, 3)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), atol=3e-6, rtol=1e-5
    )


def test_sharded_nondivisible_tile_rows():
    # 96 px → 6 tile rows over 4 devices: padded to 8 rows, cropped back
    cam, model = _setup(width=96, height=96)
    mesh = make_mesh(4)
    img_single = render(model, cam, CFG).image
    img_sharded = render_sharded(shard_model(model, mesh), cam, CFG, mesh).image
    assert img_sharded.shape == (96, 96, 3)
    np.testing.assert_allclose(
        np.asarray(img_sharded), np.asarray(img_single), atol=3e-6, rtol=1e-5
    )


def test_sharded_gradients_match_single_chip():
    cam, model = _setup(n=128, width=64, height=64)
    mesh = make_mesh(4)
    target = jax.random.uniform(jax.random.PRNGKey(9), (64, 64, 3))

    def loss_single(m):
        return photometric_loss(render(m, cam, CFG).image, target, 0.2)

    def loss_sharded(m):
        img = render_sharded(m, cam, CFG, mesh).image
        return photometric_loss(img, target, 0.2)

    g_single = jax.grad(loss_single)(model)
    g_sharded = jax.jit(jax.grad(loss_sharded))(shard_model(model, mesh))

    for name in ["means", "quats", "log_scales", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_single, name))
        b = np.asarray(getattr(g_sharded, name))
        np.testing.assert_allclose(b, a, atol=2e-6, rtol=2e-3, err_msg=name)


def test_sharded_determinism():
    cam, model = _setup(n=512)
    mesh = make_mesh(8)
    ms = shard_model(model, mesh)
    fn = jax.jit(lambda m: render_sharded(m, cam, CFG, mesh).image)
    a = np.asarray(fn(ms))
    b = np.asarray(fn(ms))
    assert np.array_equal(a, b)


def test_sharded_train_step():
    cam, model = _setup(n=256, width=64, height=128)
    mesh = make_mesh(8)
    ms = shard_model(model, mesh)
    tc = TrainConfig(num_steps=3)
    state = create_train_state(ms, tc)
    step = make_train_step(cam, CFG, tc, mesh=mesh)
    target = jnp.zeros((128, 64, 3))
    losses = []
    for _ in range(3):
        state, loss = step(state, target)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # darkening toward a black target


def test_graft_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Round-2 additions: sharded binning compaction, load telemetry, sparse
# all_to_all exchange (VERDICT round 1, items 2/3/6)
# ---------------------------------------------------------------------------


def test_sharded_pair_sort_is_fraction_of_single_chip():
    """The per-chip pair array (the sort's size) must scale ~1/D, not O(N)."""
    from gaussian_splat_tpu.ops.binning import bin_gaussians
    from gaussian_splat_tpu.ops.projection import project_gaussians

    cam, model = _setup(n=4096, width=256, height=256)
    proj = project_gaussians(model.means, model.quats, model.scales, cam)

    full = bin_gaussians(proj, 256, 256, CFG)
    ndev = 8
    cap = -(-4096 * 2 // ndev // CFG.chunk_size) * CFG.chunk_size  # factor 2.0
    band = bin_gaussians(proj, 256, 256 // ndev, CFG, max_active=cap)
    # static shape: per-band pair capacity ≤ (2/D + ε) of the single-chip one
    assert band.pair_tile.shape[0] <= full.pair_tile.shape[0] * 2 // ndev + 4 * CFG.chunk_size


def test_max_active_parity_and_drop_accounting():
    """max_active ≥ #valid: bit-identical output, dropped == 0.
    max_active < #valid: dropped counts exactly the overflow, never silent."""
    from gaussian_splat_tpu.ops.render import render

    cam, model = _setup(n=512, width=96, height=96)
    from gaussian_splat_tpu.ops.render import _project_and_shade, _effective_opacities
    from gaussian_splat_tpu.ops.tile_raster import render_tiled
    from gaussian_splat_tpu.ops.binning import bin_gaussians
    from gaussian_splat_tpu.ops.projection import project_gaussians

    proj, colors = _project_and_shade(model, cam, CFG)
    opac = _effective_opacities(model, proj, CFG)

    img_full, t_full, _ = render_tiled(proj, colors, opac, 96, 96, CFG)
    img_cap, t_cap, _, stats = render_tiled(
        proj, colors, opac, 96, 96, CFG, max_active=512, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(img_full), np.asarray(img_cap))
    assert int(stats.dropped_gaussians) == 0

    n_valid = int(jnp.sum(proj.valid))
    cap = 128
    assert n_valid > cap
    _, _, _, stats_c = render_tiled(
        proj, colors, opac, 96, 96, CFG, max_active=cap, return_stats=True
    )
    assert int(stats_c.dropped_gaussians) == n_valid - cap


def test_sharded_stats_shapes_and_balance():
    cam, model = _setup(n=512, width=128, height=128)
    mesh = make_mesh(8)
    out = render_sharded(shard_model(model, mesh), cam, CFG, mesh)
    for leaf in out.stats:
        assert leaf.shape == (8,)
    # the default capacity factor must not drop anything on a centered scene
    assert int(jnp.sum(out.stats.dropped_gaussians)) == 0
    assert int(jnp.sum(out.stats.num_pairs)) > 0


def test_sharded_imbalanced_scene_reports_drops():
    """All splats crowded into the top band: the capacity cap must be hit in
    that band ONLY, reported — and a larger factor must restore full parity."""
    cam, _ = _setup(n=512, width=128, height=128)
    key = jax.random.PRNGKey(3)
    model = GaussianModel.random(key, 512, sh_degree=0, extent=1.2,
                                 scale_range=(0.02, 0.08))
    # push every splat into the top ~1/8 of the screen (y up in world, the
    # image y axis flips): cluster tightly around a point that lands high
    means = model.means * jnp.array([0.3, 0.05, 0.3]) + jnp.array([0.0, 1.45, 0.0])
    model = model.replace(means=means)
    mesh = make_mesh(8)
    ms = shard_model(model, mesh)

    img_single = render(model, cam, CFG).image
    tight = RenderConfig(backend="jnp_tile", shard_capacity_margin=0.0,
                         shard_capacity_floor=0)
    out_tight = render_sharded(ms, cam, tight, mesh)
    drops = np.asarray(out_tight.stats.dropped_gaussians)
    assert drops.sum() > 0  # the crowded band overflowed ...
    assert (drops > 0).sum() <= 2  # ... and only the crowded band(s)

    roomy = RenderConfig(backend="jnp_tile", shard_capacity_margin=1.0)
    out_roomy = render_sharded(ms, cam, roomy, mesh)
    assert int(np.asarray(out_roomy.stats.dropped_gaussians).sum()) == 0
    np.testing.assert_allclose(
        np.asarray(out_roomy.image), np.asarray(img_single), atol=3e-6, rtol=1e-5
    )


@pytest.mark.parametrize("ndev", [2, 8])
def test_all_to_all_matches_single_chip(ndev):
    cam, model = _setup()
    mesh = make_mesh(ndev)
    cfg = RenderConfig(backend="jnp_tile", shard_exchange="all_to_all")
    img_single = render(model, cam, CFG).image
    out = render_sharded(shard_model(model, mesh), cam, cfg, mesh)
    assert int(jnp.sum(out.stats.dropped_gaussians)) == 0
    np.testing.assert_allclose(
        np.asarray(out.image), np.asarray(img_single), atol=3e-6, rtol=1e-5
    )


def test_all_to_all_gradients_match_single_chip():
    cam, model = _setup(n=128, width=64, height=64)
    mesh = make_mesh(4)
    cfg = RenderConfig(backend="jnp_tile", shard_exchange="all_to_all")
    target = jax.random.uniform(jax.random.PRNGKey(9), (64, 64, 3))

    def loss_single(m):
        return photometric_loss(render(m, cam, CFG).image, target, 0.2)

    def loss_sharded(m):
        img = render_sharded(m, cam, cfg, mesh).image
        return photometric_loss(img, target, 0.2)

    g_single = jax.grad(loss_single)(model)
    g_sharded = jax.jit(jax.grad(loss_sharded))(shard_model(model, mesh))
    for name in ["means", "quats", "log_scales", "opacity_logits", "sh"]:
        a = np.asarray(getattr(g_single, name))
        b = np.asarray(getattr(g_sharded, name))
        np.testing.assert_allclose(b, a, atol=2e-6, rtol=2e-3, err_msg=name)


def test_all_to_all_send_overflow_reported():
    cam, model = _setup(n=512, width=128, height=128)
    mesh = make_mesh(8)
    cfg = RenderConfig(
        backend="jnp_tile", shard_exchange="all_to_all",
        a2a_capacity_factor=0.25, shard_capacity_floor=0,
    )
    out = render_sharded(shard_model(model, mesh), cam, cfg, mesh)
    assert int(jnp.sum(out.stats.dropped_gaussians)) > 0
