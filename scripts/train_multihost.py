"""Multi-host sharded training launcher (north-star config 5).

Run ONE copy per host (e.g. via your pod scheduler); jax.distributed forms the
runtime from the standard TPU pod environment, the mesh spans every chip of
every host (ICI-contiguous), and the train step shards splats + tile rows
exactly as on a single host — the code path is identical to
tests/test_sharded.py, just over more devices.

Example (per host):
    python scripts/train_multihost.py --ply scene.ply --transforms data/ \
        --steps 5000 --width 3840 --height 2160 --checkpoint-dir ckpt/

Single-host invocation works too (no coordinator env needed).
"""

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True, help="initial scene PLY")
    ap.add_argument("--transforms", default=None,
                    help="transforms.json dataset dir (else synthetic target)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--out", default="trained.ply")
    ap.add_argument("--log-every", type=int, default=50)
    args = ap.parse_args(argv)

    import jax

    from gaussian_splat_tpu.parallel.distributed import init_distributed, make_pod_mesh

    multi = init_distributed()
    if jax.process_index() == 0:
        print(f"processes={jax.process_count()} devices={len(jax.devices())} multi={multi}")

    import jax.numpy as jnp
    import numpy as np

    import gaussian_splat_tpu as gs
    from gaussian_splat_tpu.config import RenderConfig, TrainConfig
    from gaussian_splat_tpu.io.ply import load_gaussians, save_gaussians
    from gaussian_splat_tpu.parallel.mesh import shard_model
    from gaussian_splat_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from gaussian_splat_tpu.train.trainer import create_train_state, make_train_step

    mesh = make_pod_mesh()
    ndev = len(jax.devices())

    model = load_gaussians(args.ply)
    # pad N to the mesh size
    n = model.num_gaussians
    pad = (-n) % ndev
    if pad:
        model = jax.tree_util.tree_map(
            lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]),
            model,
        )
        # padded slots: fully transparent
        model = model.replace(
            opacity_logits=model.opacity_logits.at[n:].set(-20.0)
        )
    model = shard_model(model, mesh)

    render_cfg = RenderConfig(backend="auto")
    tc = TrainConfig(num_steps=args.steps)

    if args.transforms:
        from gaussian_splat_tpu.io.dataset_io import load_transforms

        ds = load_transforms(args.transforms)
        camera = ds.camera(0)
        target = ds.target(0)  # single-view demo; extend with fit_multiview
    else:
        from gaussian_splat_tpu.camera import orbit_camera

        camera = orbit_camera(5.0, 30.0, 20.0, width=args.width, height=args.height)
        target = jnp.zeros((args.height, args.width, 3))

    state = create_train_state(model, tc)
    if args.checkpoint_dir:
        restored = restore_checkpoint(args.checkpoint_dir, state)
        if restored is not None:
            state = restored
            if jax.process_index() == 0:
                print(f"resumed from step {int(state.step)}")

    step_fn = make_train_step(camera, render_cfg, tc, mesh=mesh)
    for i in range(int(state.step), args.steps):
        state, loss = step_fn(state, target)
        if i % args.log_every == 0 and jax.process_index() == 0:
            print(f"step {i}: loss {float(loss):.6f}")
        if args.checkpoint_dir and (i + 1) % args.checkpoint_every == 0:
            save_checkpoint(args.checkpoint_dir, state)

    if jax.process_index() == 0:
        save_gaussians(args.out, jax.device_get(state.model))
        print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
