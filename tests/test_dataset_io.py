"""transforms.json ingestion: round-trip and render-consistency."""

import json
import os

import jax
import numpy as np

from gaussian_splat_tpu.config import RenderConfig
from gaussian_splat_tpu.io.dataset_io import load_transforms, save_transforms
from gaussian_splat_tpu.models.gaussians import GaussianModel
from gaussian_splat_tpu.ops.render import render
from gaussian_splat_tpu.train.dataset import orbit_dataset

CFG = RenderConfig(backend="jnp_tile")


def _dataset(n_views=3, res=48):
    gt = GaussianModel.random(jax.random.PRNGKey(0), 30, sh_degree=0, extent=0.7)
    ds = orbit_dataset(
        lambda cam: np.clip(np.asarray(render(gt, cam, CFG).image), 0, 1),
        n_views=n_views, radius=4.0, width=res, height=res,
    )
    return gt, ds


def test_roundtrip_poses_and_images(tmp_path):
    gt, ds = _dataset()
    save_transforms(str(tmp_path), ds)
    assert os.path.exists(tmp_path / "transforms.json")
    back = load_transforms(str(tmp_path))
    assert back.num_views == ds.num_views
    assert back.width == ds.width
    np.testing.assert_allclose(float(back.fx), float(ds.fx), rtol=1e-5)
    # poses survive the OpenGL↔OpenCV round-trip
    np.testing.assert_allclose(
        np.asarray(back.viewmats), np.asarray(ds.viewmats), atol=1e-4
    )
    # images survive the uint8 round-trip
    np.testing.assert_allclose(
        np.asarray(back.images), np.asarray(ds.images), atol=2.0 / 255.0
    )


def test_rendering_matches_after_roundtrip(tmp_path):
    gt, ds = _dataset()
    save_transforms(str(tmp_path), ds)
    back = load_transforms(str(tmp_path))
    img_orig = render(gt, ds.camera(1), CFG).image
    img_back = render(gt, back.camera(1), CFG).image
    np.testing.assert_allclose(
        np.asarray(img_back), np.asarray(img_orig), atol=5e-3
    )


def test_camera_angle_x_fallback(tmp_path):
    gt, ds = _dataset(n_views=1, res=32)
    save_transforms(str(tmp_path), ds)
    # rewrite metadata to the NeRF-synthetic style (fov instead of focals)
    meta = json.load(open(tmp_path / "transforms.json"))
    fov_x = 2.0 * np.arctan(0.5 * ds.width / float(ds.fx))
    for k in ["fl_x", "fl_y", "cx", "cy"]:
        meta.pop(k)
    meta["camera_angle_x"] = float(fov_x)
    json.dump(meta, open(tmp_path / "transforms.json", "w"))
    back = load_transforms(str(tmp_path))
    np.testing.assert_allclose(float(back.fx), float(ds.fx), rtol=1e-5)


def test_downscale(tmp_path):
    gt, ds = _dataset(n_views=1, res=48)
    save_transforms(str(tmp_path), ds)
    back = load_transforms(str(tmp_path), downscale=2)
    assert back.width == 24 and back.height == 24
    np.testing.assert_allclose(float(back.fx), float(ds.fx) / 2, rtol=1e-5)


def test_missing_frames_raises(tmp_path):
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"frames": []}, f)
    import pytest

    with pytest.raises(ValueError, match="no frames"):
        load_transforms(str(tmp_path))
