"""Benchmark: fwd+bwd on the north-star primary config (1M splats @ 1080p).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against its only encoded performance design point — the ~60 FPS frame cap at the
default viewport (SDL_Delay(16), /root/reference/src/main.mm:210-211) scaled to
1080p, i.e. baseline = 1920·1080·60 pixels/s — for the *forward* path, which is
what the reference does. The primary reported value is fwd+bwd ms/frame.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--reps", type=int, default=4, help="frames per dispatch (overhead amortization)")
    ap.add_argument("--sh-degree", type=int, default=1)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import gaussian_splat_tpu as gs

    key = jax.random.PRNGKey(0)
    model = gs.GaussianModel.random(
        key, args.n, sh_degree=args.sh_degree, extent=2.0, scale_range=(0.005, 0.02)
    )
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0),
        60.0, args.width, args.height,
    )
    config = gs.RenderConfig(backend=args.backend)

    # Amortize per-dispatch host↔device overhead by rendering `reps` frames
    # inside ONE jitted scan (the jiggle of the means between frames defeats
    # CSE without changing the workload).
    reps = args.reps

    @jax.jit
    def fwd(m):
        def step(carry, i):
            mi = m.replace(means=m.means + 1e-6 * i)
            img = gs.render(mi, camera, config).image
            return carry + img[0, 0, 0], None

        total, _ = jax.lax.scan(step, 0.0, jnp.arange(reps, dtype=jnp.float32))
        return total

    def loss(m):
        return jnp.mean(gs.render(m, camera, config).image ** 2)

    @jax.jit
    def bwd(m):
        def step(carry, i):
            mi = m.replace(means=m.means + 1e-6 * i)
            g = jax.grad(loss)(mi)
            return carry + g.means[0, 0], None

        total, _ = jax.lax.scan(step, 0.0, jnp.arange(reps, dtype=jnp.float32))
        return total

    def median_ms(fn, arg, iters):
        jax.block_until_ready(fn(arg))  # compile + warm
        jax.block_until_ready(fn(arg))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            ts.append((time.perf_counter() - t0) * 1e3 / reps)
        ts.sort()
        return ts[len(ts) // 2]

    fwd_ms = median_ms(fwd, model, args.iters)
    fwdbwd_ms = None if args.fwd_only else median_ms(bwd, model, args.iters)

    pixels = args.width * args.height
    pixels_per_s = pixels / (fwd_ms / 1e3)
    baseline_pixels_per_s = 1920 * 1080 * 60.0  # reference 60 FPS design point

    primary_ms = fwd_ms if args.fwd_only else fwdbwd_ms
    result = {
        "metric": f"fwd+bwd ms/frame @ {args.n} splats {args.width}x{args.height}",
        "value": round(primary_ms, 3),
        "unit": "ms",
        "vs_baseline": round(pixels_per_s / baseline_pixels_per_s, 3),
        "fwd_ms": round(fwd_ms, 3),
        "fwd_bwd_ms": None if fwdbwd_ms is None else round(fwdbwd_ms, 3),
        "fwd_pixels_per_s": round(pixels_per_s),
        "backend": config.backend,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
