"""Projection property tests against the closed forms of the reference's vertex
shader (K0, /root/reference/shaders/gaussian_splat.metal:55-196)."""

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_tpu.camera import Camera, look_at
from gaussian_splat_tpu.ops.projection import (
    compute_cov3d,
    project_gaussians,
    quat_to_rotmat,
)


def _camera(width=64, height=64, fov=60.0):
    return Camera.from_lookat(
        eye=(0.0, 0.0, -5.0),
        target=(0.0, 0.0, 0.0),
        up=(0.0, 1.0, 0.0),
        fov_y_deg=fov,
        width=width,
        height=height,
    )


class TestQuatToRotmat:
    def test_identity(self):
        R = quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
        np.testing.assert_allclose(R, jnp.eye(3), atol=1e-6)

    def test_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        R = quat_to_rotmat(q)
        eye = jnp.eye(3)[None].repeat(32, 0)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), jnp.ones(32), atol=1e-5)

    def test_unnormalized_quat_same_rotation(self):
        q = jnp.array([0.3, -0.5, 0.7, 0.1])
        np.testing.assert_allclose(
            quat_to_rotmat(q), quat_to_rotmat(3.7 * q), atol=1e-5
        )

    def test_known_rotation_90deg_z(self):
        # 90° about z (wxyz): w=cos(45°), z=sin(45°)
        s = np.sin(np.pi / 4)
        R = quat_to_rotmat(jnp.array([s, 0.0, 0.0, s]))
        expected = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(R, expected, atol=1e-6)


class TestCov3d:
    def test_psd_and_symmetric(self):
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (16, 4))
        s = jax.random.uniform(jax.random.fold_in(key, 1), (16, 3), minval=0.01, maxval=1.0)
        cov = compute_cov3d(q, s)
        np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), atol=1e-6)
        eigs = jnp.linalg.eigvalsh(cov)
        assert (eigs > -1e-6).all()

    def test_isotropic_identity_quat(self):
        cov = compute_cov3d(jnp.array([1.0, 0.0, 0.0, 0.0]), jnp.array([0.5, 0.5, 0.5]))
        np.testing.assert_allclose(cov, 0.25 * jnp.eye(3), atol=1e-6)

    def test_rotation_invariant_trace(self):
        q = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
        s = jnp.tile(jnp.array([[0.1, 0.2, 0.3]]), (8, 1))
        cov = compute_cov3d(q, s)
        np.testing.assert_allclose(
            jnp.trace(cov, axis1=-2, axis2=-1),
            jnp.full(8, 0.01 + 0.04 + 0.09),
            rtol=1e-5,
        )


class TestProjection:
    def test_center_projects_to_principal_point(self):
        cam = _camera()
        means = jnp.array([[0.0, 0.0, 0.0]])  # on the optical axis
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), 0.1)
        proj = project_gaussians(means, quats, scales, cam)
        np.testing.assert_allclose(proj.means2d[0], jnp.array([32.0, 32.0]), atol=1e-4)
        np.testing.assert_allclose(proj.depths[0], 5.0, atol=1e-5)
        assert bool(proj.valid[0])

    def test_behind_camera_culled(self):
        cam = _camera()
        means = jnp.array([[0.0, 0.0, -10.0]])  # behind the eye at z=-5
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), 0.1)
        proj = project_gaussians(means, quats, scales, cam)
        assert not bool(proj.valid[0])
        assert int(proj.radii[0]) == 0

    def test_far_offscreen_culled(self):
        cam = _camera()
        means = jnp.array([[100.0, 0.0, 0.0]])
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), 0.01)
        proj = project_gaussians(means, quats, scales, cam)
        assert not bool(proj.valid[0])

    def test_isotropic_cov2d_matches_closed_form(self):
        """Isotropic gaussian on the optical axis: cov2d ≈ (f·s/z)²·I + dilation.

        This is the closed-form specialization of the EWA chain in
        gaussian_splat.metal:137-163 (J has no shear on-axis)."""
        cam = _camera()
        s = 0.2
        dilation = 0.3
        means = jnp.array([[0.0, 0.0, 0.0]])
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), s)
        proj = project_gaussians(
            means, quats, scales, cam, cov2d_dilation=dilation
        )
        f = float(cam.fx)
        expected = (f * s / 5.0) ** 2
        a, b, c = np.asarray(proj.cov2d[0])
        assert abs(a - (expected + dilation)) < 1e-3 * expected
        assert abs(c - (expected + dilation)) < 1e-3 * expected
        assert abs(b) < 1e-4

    def test_radius_scales_with_size(self):
        cam = _camera()
        quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
        means = jnp.zeros((2, 3))
        scales = jnp.array([[0.05] * 3, [0.4] * 3])
        proj = project_gaussians(means, quats, scales, cam)
        assert int(proj.radii[1]) > int(proj.radii[0]) > 0

    def test_conic_is_inverse_cov(self):
        cam = _camera()
        q = jax.random.normal(jax.random.PRNGKey(3), (10, 4))
        means = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (10, 3))
        scales = jax.random.uniform(jax.random.PRNGKey(5), (10, 3), minval=0.05, maxval=0.3)
        proj = project_gaussians(means, q, scales, cam)
        a, b, c = proj.cov2d[:, 0], proj.cov2d[:, 1], proj.cov2d[:, 2]
        A, B, C = proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2]
        np.testing.assert_allclose(a * A + b * B, jnp.ones(10), rtol=1e-4)
        np.testing.assert_allclose(b * A + c * B, jnp.zeros(10), atol=1e-4)
        np.testing.assert_allclose(b * B + c * C, jnp.ones(10), rtol=1e-4)

    def test_differentiable(self):
        cam = _camera()

        def loss(means):
            proj = project_gaussians(
                means,
                jnp.array([[1.0, 0.0, 0.0, 0.0]]),
                jnp.full((1, 3), 0.1),
                cam,
            )
            return jnp.sum(proj.means2d)

        g = jax.grad(loss)(jnp.array([[0.1, 0.05, 0.0]]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert not np.allclose(np.asarray(g), 0.0)


class TestAntialiasCompensation:
    def test_compensation_range_and_monotonicity(self):
        cam = _camera()
        quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
        means = jnp.zeros((2, 3))
        # tiny splat vs large splat: tiny one is dampened much more
        scales = jnp.array([[0.001] * 3, [0.5] * 3])
        proj = project_gaussians(means, quats, scales, cam)
        c = np.asarray(proj.compensation)
        assert 0.0 <= c[0] < 0.2
        assert 0.9 < c[1] <= 1.0

    def test_antialiased_render_differs_only_via_opacity(self):
        import gaussian_splat_tpu as gs

        model = gs.GaussianModel.random(jax.random.PRNGKey(3), 30, sh_degree=0,
                                        scale_range=(0.002, 0.02))
        cam = _camera()
        on = gs.render(model, cam, gs.RenderConfig(backend="jnp_tile", antialiased=True)).image
        off = gs.render(model, cam, gs.RenderConfig(backend="jnp_tile", antialiased=False)).image
        # antialiasing only dims (opacity scale ≤ 1): no pixel gets brighter
        assert float(jnp.max(on - off)) < 1e-5
        assert float(jnp.max(off - on)) > 1e-4  # and some pixels dim


class TestEllipseExtents:
    """The per-axis extents are the EXACT AABB of the {σ ≤ σ_max} ellipse:
    tighter than the circular radius, yet no contributing pixel escapes."""

    def test_extents_bound_support_and_beat_circle(self):
        cam = _camera()
        key = jax.random.PRNGKey(7)
        n = 64
        quats = jax.random.normal(key, (n, 4))
        means = jax.random.normal(jax.random.PRNGKey(8), (n, 3)) * 0.4
        # strongly anisotropic scales so the ellipse AABB matters
        scales = jnp.exp(jax.random.uniform(
            jax.random.PRNGKey(9), (n, 3), minval=-5.0, maxval=-2.0))
        proj = project_gaussians(means, quats, scales, cam)
        ext = np.asarray(proj.extents)
        r = np.asarray(proj.radii, float)
        valid = np.asarray(proj.valid)
        conics = np.asarray(proj.conics)
        from gaussian_splat_tpu.config import RenderConfig
        sigma_cut = RenderConfig().sigma_cutoff

        assert (ext[valid, 0] <= r[valid] + 1e-4).all()
        assert (ext[valid, 1] <= r[valid] + 1e-4).all()
        # anisotropic scenes: the AABB area is strictly smaller than the circle
        assert np.mean(ext[valid, 0] * ext[valid, 1]) < 0.9 * np.mean(r[valid] ** 2)

        # exactness: sample points on the σ = σ_max level set; all must lie
        # inside the extents box (the AABB contains the whole support)
        theta = np.linspace(0, 2 * np.pi, 64)
        for i in np.nonzero(valid)[0][:16]:
            A, B, C = conics[i]
            conic = np.array([[A, B], [B, C]])
            # level-set points: d = sqrt(2σ/quad(u)) * u over directions u
            u = np.stack([np.cos(theta), np.sin(theta)], -1)
            quad = 0.5 * np.einsum("td,de,te->t", u, conic, u)
            d = u * np.sqrt(sigma_cut / np.maximum(quad, 1e-12))[:, None]
            assert (np.abs(d[:, 0]) <= ext[i, 0] * (1 + 1e-4) + 1e-4).all()
            assert (np.abs(d[:, 1]) <= ext[i, 1] * (1 + 1e-4) + 1e-4).all()
            # tightness: the level set TOUCHES the box on each axis
            assert np.abs(d[:, 0]).max() > ext[i, 0] * 0.95
            assert np.abs(d[:, 1]).max() > ext[i, 1] * 0.95
