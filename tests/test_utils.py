"""Timing + hot reload utilities."""

import time

import jax.numpy as jnp

from gaussian_splat_tpu.utils.hot_reload import HotReloader
from gaussian_splat_tpu.utils.timing import RollingStats, ScopeTimer, time_fn


def test_rolling_stats_window():
    rs = RollingStats(window=3)
    for v in [1.0, 2.0, 3.0, 4.0]:
        rs.push(v)
    assert len(rs) == 3
    assert rs.mean == 3.0
    assert rs.min == 2.0 and rs.max == 4.0 and rs.last == 4.0


def test_scope_timer_records():
    t = ScopeTimer()
    with t.scope("work") as h:
        h["result"] = jnp.arange(10).sum()
        time.sleep(0.01)
    assert t.stats["work"].last >= 10.0  # ≥10 ms
    assert "work" in t.report()


def test_time_fn_returns_positive():
    ms = time_fn(lambda x: x * 2, jnp.arange(100), warmup=1, iters=3)
    assert ms >= 0.0


def test_hot_reload_keeps_last_good(tmp_path):
    import sys

    mod_path = tmp_path / "reloadable_kernel_mod.py"
    mod_path.write_text("def make():\n    return lambda x: x + 1\n")
    sys.path.insert(0, str(tmp_path))
    try:
        r = HotReloader(
            "reloadable_kernel_mod",
            build=lambda m: m.make(),
            verbose=False,
        )
        assert r.get()(1) == 2

        # good edit → picks up new behavior
        time.sleep(0.02)
        mod_path.write_text("def make():\n    return lambda x: x + 10\n")
        import os

        os.utime(mod_path, (time.time() + 5, time.time() + 5))
        assert r.get()(1) == 11

        # broken edit → keeps last good
        mod_path.write_text("def make():\n    raise RuntimeError('boom')\n")
        os.utime(mod_path, (time.time() + 10, time.time() + 10))
        assert r.get()(1) == 11
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("reloadable_kernel_mod", None)


def test_checked_render_and_grads_clean_scene():
    import jax

    from gaussian_splat_tpu.camera import Camera
    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.utils.guards import checked_grads, checked_render, find_nonfinite

    model = GaussianModel.random(jax.random.PRNGKey(0), 64, sh_degree=0)
    cam = Camera.from_lookat((0, 0, -4), (0, 0, 0), (0, 1, 0), 60.0, 48, 32)
    img = checked_render(model, cam)
    assert img.shape == (32, 48, 3)
    grads = checked_grads(model, cam)
    assert find_nonfinite(grads) == ()


def test_find_nonfinite_flags_bad_leaves():
    import jax.numpy as jnp

    from gaussian_splat_tpu.utils.guards import find_nonfinite

    tree = {"good": jnp.ones(3), "bad": jnp.array([1.0, jnp.nan])}
    bad = find_nonfinite(tree)
    assert len(bad) == 1 and "bad" in bad[0]
