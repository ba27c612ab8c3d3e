"""Multi-view training data: (camera, image) pairs with random view sampling.

The reference loads a single pre-trained PLY and has no training data concept;
this supplies the standard 3DGS training-shape: a set of posed views. Images
are stacked once into a device array; cameras with identical intrinsics/shape
are stacked into a batched pytree so a jitted train step can index a view by a
traced integer (no per-view recompilation).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splat_tpu.camera import Camera


@dataclasses.dataclass
class ViewDataset:
    """Stacked posed views. All cameras share (fx, fy, cx, cy, W, H)."""

    viewmats: jax.Array  # (V, 4, 4)
    images: jax.Array  # (V, H, W, 3) float32 in [0,1]
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int
    height: int

    @classmethod
    def from_views(
        cls, views: Sequence[Tuple[Camera, np.ndarray]]
    ) -> "ViewDataset":
        cams = [c for c, _ in views]
        w, h = cams[0].width, cams[0].height
        for c in cams:
            assert (c.width, c.height) == (w, h), "all views must share resolution"
        return cls(
            viewmats=jnp.stack([c.viewmat for c in cams]),
            images=jnp.stack(
                [jnp.asarray(img, jnp.float32) for _, img in views]
            ),
            fx=cams[0].fx,
            fy=cams[0].fy,
            cx=cams[0].cx,
            cy=cams[0].cy,
            width=w,
            height=h,
        )

    @property
    def num_views(self) -> int:
        return self.images.shape[0]

    def camera(self, i) -> Camera:
        """Camera for view i (i may be traced — jit-safe)."""
        return Camera(
            viewmat=self.viewmats[i],
            fx=self.fx,
            fy=self.fy,
            cx=self.cx,
            cy=self.cy,
            width=self.width,
            height=self.height,
        )

    def target(self, i) -> jax.Array:
        return self.images[i]


def orbit_dataset(
    render_fn,
    n_views: int = 8,
    radius: float = 4.0,
    elevation_deg: float = 20.0,
    width: int = 256,
    height: int = 256,
    fov_y_deg: float = 50.0,
) -> ViewDataset:
    """Synthesize a turntable dataset by rendering `render_fn(camera)` — used
    in tests to create ground-truth multi-view sets."""
    from gaussian_splat_tpu.camera import orbit_camera

    views = []
    for i in range(n_views):
        cam = orbit_camera(
            radius, 360.0 * i / n_views, elevation_deg,
            fov_y_deg=fov_y_deg, width=width, height=height,
        )
        views.append((cam, np.asarray(render_fn(cam))))
    return ViewDataset.from_views(views)
