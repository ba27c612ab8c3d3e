"""Round-5 tuning matrix: pair-budget and tier parameters vs end-to-end time.

Every B-proportional stage (pair row gather ~7.26 ns/row, VJP rank sort
~0.82 ns/row/operand, segment sum) scales with `pair_budget`, and the pair
sort scales with the PADDED expansion size (m*k_small + m_big*K). The default
budget (pairs_per_gaussian=4.0) carries ~60% headroom over the bench scene's
measured 2.46M pairs. This script times full fwd and fwd+bwd for a small
config matrix on the chip and reports pairs/overflow/clamped so the default
can be tightened without silently changing output (overflow==0 required).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_tune.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

import gaussian_splat_tpu as gs


def median_ms(fn, arg, reps, iters=4):
    jax.block_until_ready(fn(arg))
    jax.block_until_ready(fn(arg))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append((time.perf_counter() - t0) * 1e3 / reps)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    n, W, H, reps = 1_000_000, 1920, 1080, 8
    key = jax.random.PRNGKey(0)
    model = gs.GaussianModel.random(
        key, n, sh_degree=1, extent=2.0, scale_range=(0.005, 0.02)
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0, W, H
    )

    variants = {
        "default(ppg4,k6,f32)": {},
        "ppg3": {"pairs_per_gaussian": 3.0},
        "ppg2.75": {"pairs_per_gaussian": 2.75},
        "ppg3,k4,f16": {
            "pairs_per_gaussian": 3.0,
            "small_tiles_per_gaussian": 4,
            "big_gaussian_fraction": 16,
        },
    }

    results = {}
    for name, overrides in variants.items():
        config = dataclasses.replace(
            gs.RenderConfig(backend="pallas"), **overrides
        )

        @jax.jit
        def fwd(m, config=config):
            def step(carry, i):
                mi = m.replace(means=m.means + 1e-6 * i)
                img = gs.render(mi, camera, config).image
                return carry + img[0, 0, 0], None

            total, _ = jax.lax.scan(
                step, 0.0, jnp.arange(reps, dtype=jnp.float32)
            )
            return total

        def loss(m, config=config):
            return jnp.mean(gs.render(m, camera, config).image ** 2)

        @jax.jit
        def bwd(m, config=config, loss=loss):
            def step(carry, i):
                mi = m.replace(means=m.means + 1e-6 * i)
                g = jax.grad(loss)(mi)
                return carry + g.means[0, 0], None

            total, _ = jax.lax.scan(
                step, 0.0, jnp.arange(reps, dtype=jnp.float32)
            )
            return total

        # stats (overflow must stay 0 for an output-identical tightening)
        from gaussian_splat_tpu.ops.pallas_raster import render_tiled_pallas
        from gaussian_splat_tpu.ops.render import (
            _effective_opacities,
            _project_and_shade,
        )

        @jax.jit
        def stats(m, config=config):
            proj, colors = _project_and_shade(m, camera, config)
            opac = _effective_opacities(m, proj, config)
            return render_tiled_pallas(
                proj, colors, opac, W, H, config, return_stats=True
            )[3]

        st = jax.device_get(stats(model))
        fwd_ms = median_ms(fwd, model, reps)
        bwd_ms = median_ms(bwd, model, reps)
        results[name] = {
            "fwd_ms": round(fwd_ms, 2),
            "fwd_bwd_ms": round(bwd_ms, 2),
            "num_pairs": int(st.num_pairs),
            "overflow": int(st.overflow),
            "clamped": int(st.clamped_rects),
            "tier_overflow": int(st.tier_overflow),
            "budget": config.pair_budget(n),
        }
        print(name, json.dumps(results[name]), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
