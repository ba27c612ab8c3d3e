"""Decompose the binning 'rects/σ-test/top_k' bundle at the bench shape.

The round-5 per-stage profile attributes ~12-14 ms of binning to the
non-sort, non-gather work (rect construction, the two top_k calls, the
σ-bound cell test, expansion key packing). This isolates each at 1M/1080p
with the CALIBRATED config so the next optimization lever is chosen from
data, not vibes.

Run: PYTHONPATH=... python scripts/exp_binstages.py
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import gaussian_splat_tpu as gs
    from gaussian_splat_tpu.ops.binning import (
        effective_rects, rect_codes, tile_rects,
    )
    from gaussian_splat_tpu.ops.render import (
        _effective_opacities, _project_and_shade, calibrate_render_config,
    )

    n, W, H, reps = 1_000_000, 1920, 1080, 8
    model = gs.GaussianModel.random(
        jax.random.PRNGKey(0), n, sh_degree=1, extent=2.0,
        scale_range=(0.005, 0.02),
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0, W, H
    )
    cfg = calibrate_render_config(
        model, camera, gs.RenderConfig(backend="pallas")
    )
    proj, _ = jax.jit(lambda m: _project_and_shade(m, camera, cfg))(model)
    opac = jax.jit(lambda m: _effective_opacities(m, proj, cfg))(model)
    jax.block_until_ready((proj, opac))

    def timed(fn, *args, iters=4):
        @jax.jit
        def scanned(*a):
            def step(c, i):
                out = fn(*a, jiggle=i)
                leaves = jax.tree_util.tree_leaves(out)
                return c + sum(
                    jnp.sum(l.reshape(-1)[:1].astype(jnp.float32))
                    for l in leaves
                ), None

            tot, _ = jax.lax.scan(
                step, 0.0, jnp.arange(reps, dtype=jnp.float32)
            )
            return tot

        jax.block_until_ready(scanned(*args))
        jax.block_until_ready(scanned(*args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(scanned(*args))
            ts.append((time.perf_counter() - t0) * 1e3 / reps)
        ts.sort()
        return ts[len(ts) // 2]

    out = {"big_tier_capacity": cfg.big_tier_capacity}

    def f_tile_rects(p, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        return tile_rects(
            pi.means2d, pi.radii, pi.valid, W, H, cfg, extents=pi.extents
        )

    out["tile_rects"] = timed(f_tile_rects, proj)
    print("tile_rects", out["tile_rects"], flush=True)

    def f_eff_rects(p, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        return effective_rects(
            pi.means2d, pi.radii, pi.valid, W, H, cfg, extents=pi.extents
        )

    out["effective_rects(total incl top_k)"] = timed(f_eff_rects, proj)
    print("effective_rects", out["effective_rects(total incl top_k)"], flush=True)

    def f_codes(p, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        return rect_codes(pi, W, H, cfg)

    out["rect_codes"] = timed(f_codes, proj)
    print("rect_codes", out["rect_codes"], flush=True)

    # isolated top_k over the area score at the calibrated capacity
    _tx0, _ty0, w_r, h_r, _cl = jax.jit(f_tile_rects, static_argnums=())(
        proj, jnp.float32(0)
    )
    area = (w_r * h_r).astype(jnp.int32)
    m_big = cfg.big_capacity(n)

    def f_topk(a, jiggle):
        ai = a + (jiggle * 0).astype(a.dtype)
        return jax.lax.top_k(ai, m_big)

    out[f"top_k(area, {m_big})"] = timed(f_topk, area)
    print("top_k", out[f"top_k(area, {m_big})"], flush=True)

    # σ-cell test cost: bin with vs without opacities, same everything else
    from gaussian_splat_tpu.ops.binning import bin_gaussians

    def f_bin_sigma(p, o, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        return bin_gaussians(pi, W, H, cfg, opacities=o).num_pairs

    def f_bin_nosigma(p, jiggle):
        pi = p._replace(means2d=p.means2d + 1e-6 * jiggle)
        return bin_gaussians(pi, W, H, cfg).num_pairs

    out["bin_total_sigma"] = timed(f_bin_sigma, proj, opac)
    print("bin σ", out["bin_total_sigma"], flush=True)
    out["bin_total_nosigma"] = timed(f_bin_nosigma, proj)
    print("bin no-σ", out["bin_total_nosigma"], flush=True)

    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
