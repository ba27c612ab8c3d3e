"""Multi-process jax.distributed smoke test (SURVEY §4: "jax.distributed
multi-process tests gated on environment").

Skipped unless GSPLAT_MULTIPROC_TEST=1 — it spawns two local processes that
form a distributed runtime over TCP, build a 2-process mesh, and check a
sharded render agrees with single-process output.
"""

import os
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
import numpy as np
import gaussian_splat_tpu as gs
from gaussian_splat_tpu.parallel.distributed import make_pod_mesh
from gaussian_splat_tpu.parallel.mesh import shard_model
from gaussian_splat_tpu.parallel.sharded_render import render_sharded

assert jax.process_count() == 2, jax.process_count()
mesh = make_pod_mesh()
model = gs.GaussianModel.random(jax.random.PRNGKey(0), 64, sh_degree=0, extent=0.8)
cfg = gs.RenderConfig(backend="jnp_tile")
cam = gs.Camera.from_lookat((0,0,-4),(0,0,0),(0,1,0),60,32,64)
img_single = gs.render(model, cam, cfg).image
img_shard = render_sharded(shard_model(model, mesh), cam, cfg, mesh).image
# each process holds its shard; compare the addressable rows
gathered = np.asarray(jax.experimental.multihost_utils.process_allgather(img_shard, tiled=True))
np.testing.assert_allclose(gathered, np.asarray(img_single), atol=1e-5)
print(f"proc {jax.process_index()} OK", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("GSPLAT_MULTIPROC_TEST") != "1",
    reason="set GSPLAT_MULTIPROC_TEST=1 to run the 2-process distributed test",
)
def test_two_process_distributed_render(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        COORD="127.0.0.1:45677",
        JAX_PLATFORMS="cpu",
        PYTHONPATH=repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "OK" in out
