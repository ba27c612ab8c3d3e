"""Golden-image regression test on a deterministic procedural scene
(north-star config 3's "golden renders" on a PLY scene this repo loads).

The golden is generated once (tests/golden/scene.ply + golden.npy via
`python tests/test_golden.py regen`) and every backend must reproduce it.
"""

import os
import sys

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PLY = os.path.join(GOLDEN_DIR, "scene.ply")
NPY = os.path.join(GOLDEN_DIR, "golden.npy")

WIDTH, HEIGHT = 160, 120


def _build_scene():
    """Deterministic torus-knot of 2000 colored splats."""
    import jax.numpy as jnp

    from gaussian_splat_tpu.models.gaussians import GaussianModel
    from gaussian_splat_tpu.ops.sh import rgb_to_sh_dc

    n = 2000
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    p, q = 2, 3
    r = 0.6 + 0.25 * np.cos(q * t)
    x = r * np.cos(p * t)
    y = r * np.sin(p * t)
    z = 0.35 * np.sin(q * t)
    means = np.stack([x, y, z], -1)
    rgb = 0.5 + 0.5 * np.stack(
        [np.cos(t), np.cos(t + 2.1), np.cos(t + 4.2)], -1
    )
    sh = np.asarray(rgb_to_sh_dc(jnp.asarray(rgb)))[:, None, :]
    return GaussianModel.create(
        means=means,
        quats=np.tile([1.0, 0.0, 0.0, 0.0], (n, 1)),
        log_scales=np.full((n, 3), np.log(0.02)),
        opacity_logits=np.full((n,), 1.5),
        sh=sh,
    )


def _camera():
    from gaussian_splat_tpu.camera import Camera

    return Camera.from_lookat(
        (0.0, 1.2, -2.6), (0, 0, 0), (0, 1, 0), 50.0, WIDTH, HEIGHT
    )


def _render(backend):
    from gaussian_splat_tpu.config import RenderConfig
    from gaussian_splat_tpu.io.ply import load_gaussians
    from gaussian_splat_tpu.ops.render import render

    model = load_gaussians(PLY)
    cfg = RenderConfig(backend=backend, background=(0.05, 0.05, 0.08))
    return np.asarray(render(model, _camera(), cfg).image)


def regen():
    from gaussian_splat_tpu.io.ply import save_gaussians

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    save_gaussians(PLY, _build_scene())
    img = _render("reference")
    np.save(NPY, img.astype(np.float16))  # compact storage, tolerance-checked
    print(f"regenerated golden: {PLY}, {NPY} (max={img.max():.4f})")


def test_golden_exists():
    assert os.path.exists(PLY) and os.path.exists(NPY), (
        "golden files missing — run `python tests/test_golden.py regen`"
    )


def test_reference_matches_golden():
    golden = np.load(NPY).astype(np.float32)
    img = _render("reference")
    assert np.abs(img - golden).max() < 2e-3


def test_jnp_tile_matches_golden():
    golden = np.load(NPY).astype(np.float32)
    img = _render("jnp_tile")
    assert np.abs(img - golden).max() < 2e-3


def test_pallas_matches_golden():
    golden = np.load(NPY).astype(np.float32)
    img = _render("pallas")
    assert np.abs(img - golden).max() < 2e-3


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax

        jax.config.update("jax_platforms", "cpu")
        regen()
