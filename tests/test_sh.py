"""SH evaluation tests: orthonormality-adjacent properties and the reference's
DC-band affine map (shToRGB, /root/reference/src/ply_loader.cpp:9-20)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splat_tpu.ops import sh as sh_ops


def test_num_bases():
    assert [sh_ops.num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]


def test_dc_matches_reference_shtorgb():
    # reference: rgb = clamp(0.5 + 0.2820948 * f_dc, 0, 1) — ply_loader.cpp:11-20.
    # Ours is the same affine map (lower clamp only).
    f_dc = jnp.array([[0.7, -0.3, 1.2]])
    sh = f_dc[:, None, :]  # (1,1,3)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    rgb = sh_ops.eval_sh(0, sh, dirs)
    expected = jnp.maximum(0.5 + 0.28209479177387814 * f_dc, 0.0)
    np.testing.assert_allclose(rgb, expected, rtol=1e-6)


def test_dc_is_direction_independent():
    key = jax.random.PRNGKey(0)
    sh = jax.random.normal(key, (5, 1, 3))
    d1 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    d2 = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (5, 1))
    np.testing.assert_allclose(
        sh_ops.eval_sh(0, sh, d1), sh_ops.eval_sh(0, sh, d2), rtol=1e-6
    )


@pytest.mark.parametrize("degree", [1, 2, 3])
def test_higher_degrees_vary_with_direction(degree):
    key = jax.random.PRNGKey(1)
    K = sh_ops.num_sh_bases(degree)
    sh = jax.random.normal(key, (3, K, 3))
    d1 = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
    d2 = jnp.tile(jnp.array([[0.6, 0.8, 0.0]]), (3, 1))
    a = sh_ops.eval_sh(degree, sh, d1)
    b = sh_ops.eval_sh(degree, sh, d2)
    assert not np.allclose(a, b)


def test_mean_over_sphere_is_dc():
    """Bands ≥ 1 integrate to zero over the sphere, so the spherical mean of the
    evaluated color equals the DC color (within clamp effects)."""
    key = jax.random.PRNGKey(2)
    sh = 0.05 * jax.random.normal(key, (1, 16, 3))
    sh = sh.at[0, 0, :].set(1.0)  # bright DC so the ≥0 clamp never binds
    n = 20000
    dirs = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    vals = sh_ops.eval_sh(3, jnp.tile(sh, (n, 1, 1)), dirs)
    mean = jnp.mean(vals, axis=0)
    expected = 0.5 + 0.28209479177387814 * sh[0, 0, :]
    np.testing.assert_allclose(mean, expected, atol=0.02)


def test_rgb_to_sh_dc_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    dc = sh_ops.rgb_to_sh_dc(rgb)
    back = sh_ops.eval_sh(0, dc[:, None, :], jnp.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(back, rgb, rtol=1e-6)
