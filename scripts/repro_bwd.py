"""Minimal repro of the round-3 backward-kernel TPU compile failure.

Runs the fused raster fwd+bwd at a small shape on the real chip and prints
per-phase status; exits nonzero if any phase fails to compile/run.
"""

import sys
import time

import jax
import jax.numpy as jnp

import gaussian_splat_tpu as gs


def main():
    n = 50_000
    W, H = 640, 352
    key = jax.random.PRNGKey(0)
    model = gs.GaussianModel.random(
        key, n, sh_degree=1, extent=2.0, scale_range=(0.005, 0.02)
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0, W, H
    )
    config = gs.RenderConfig(backend="pallas")

    rc = 0
    t0 = time.perf_counter()
    try:
        img = jax.jit(lambda m: gs.render(m, camera, config).image)(model)
        jax.block_until_ready(img)
        print(f"FWD OK  {time.perf_counter()-t0:.1f}s  sum={float(img.sum()):.4f}")
    except Exception as e:
        print(f"FWD FAIL: {type(e).__name__}: {str(e)[:500]}")
        rc |= 1

    t0 = time.perf_counter()
    try:
        def loss(m):
            return jnp.mean(gs.render(m, camera, config).image ** 2)

        g = jax.jit(jax.grad(loss))(model)
        jax.block_until_ready(g)
        print(
            f"BWD OK  {time.perf_counter()-t0:.1f}s  "
            f"|g.means|={float(jnp.abs(g.means).sum()):.6f}"
        )
    except Exception as e:
        print(f"BWD FAIL: {type(e).__name__}: {str(e)[:800]}")
        rc |= 2
    sys.exit(rc)


if __name__ == "__main__":
    main()
