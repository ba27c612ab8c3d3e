"""Regenerate a procedural scene PLY artifact (scenes/ is gitignored).

The trained artifacts (scenes/fitted*.ply) are produced by train_scene.py;
this writes the deterministic procedural ground-truth world directly —
same generator the training harness fits against (make_gt_scene) — at any
scale, for viewer/FPS/LoD measurements that need a reference-scale scene
without a multi-minute training run.

Run: python scripts/make_scene_ply.py [n_splats] [out.ply]
     (defaults: 2_500_000 scenes/gt_2p5m.ply)
"""

import sys


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_500_000
    out = sys.argv[2] if len(sys.argv) > 2 else "scenes/gt_2p5m.ply"

    import os

    import jax

    jax.config.update("jax_platforms", "cpu")  # generation is host-side
    sys.path.insert(0, os.path.dirname(__file__))
    from train_scene import make_gt_scene

    from gaussian_splat_tpu.io.ply import save_gaussians

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    m = make_gt_scene(seed=0, n_target=n)
    save_gaussians(out, m)
    print(f"{out}: {m.num_gaussians} splats, {os.path.getsize(out)} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
