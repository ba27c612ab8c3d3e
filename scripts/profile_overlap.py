"""Measure whether gradient collectives overlap backward compute (item P4).

PARITY.md claims "gradient reduction overlapped with backward" on the
strength of XLA's collective scheduling; until round 5 no artifact showed
where the reduce-scatter actually lands. Real multi-chip hardware is not
available here, but the REAL XLA:TPU schedule is: `jax.experimental.
topologies` AOT-compiles the full sharded train step for an 8-chip v5e
(2x4) topology with the local libtpu compiler — no chips needed — and the
optimized HLO of a TPU module is emitted in SCHEDULE ORDER after the
latency-hiding scheduler runs. Async collectives appear as paired
`<op>-start` / `<op>-done` instructions; every compute instruction between
a pair executes while that collective is in flight on the ICI. Counting
the scheduled compute (and its estimated cost share) between each
start/done pair IS the overlap measurement for TPU.

Writes docs/overlap_schedule.json and prints a summary.

Run: python scripts/profile_overlap.py  (TPU platform for lowering; compiles
AOT for 8 virtual v5e chips, ~2-5 min)
"""

import json
import re
import sys

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import gaussian_splat_tpu as gs
    from gaussian_splat_tpu.config import TrainConfig
    from gaussian_splat_tpu.train.trainer import create_train_state, make_train_step

    n, W, H = 262_144, 1024, 1024  # modest shape; schedule structure is
    #   what matters, and every band must hold ≥1 tile row of the 1024px frame
    td = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
    mesh = Mesh(np.array(td.devices), ("dev",))
    camera = gs.Camera.from_lookat(
        (0.0, 0.5, -5.0), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), 60.0, W, H
    )
    cfg = gs.RenderConfig(backend="pallas")
    tc = TrainConfig(num_steps=1)

    def init(key):
        m = gs.GaussianModel.random(
            key, n, sh_degree=1, extent=2.0, scale_range=(0.005, 0.02)
        )
        return create_train_state(m, tc)

    state_shape = jax.eval_shape(init, jax.random.PRNGKey(0))

    def with_sharding(leaf):
        spec = P("dev") if (leaf.ndim >= 1 and leaf.shape[:1] == (n,)) else P()
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype, sharding=NamedSharding(mesh, spec)
        )

    abstract_state = jax.tree_util.tree_map(with_sharding, state_shape)
    target = jax.ShapeDtypeStruct(
        (H, W, 3), jnp.float32, sharding=NamedSharding(mesh, P())
    )

    step = make_train_step(camera, cfg, tc, mesh=mesh, donate=False)
    print("lowering + AOT compiling for", td, flush=True)
    compiled = step.lower(abstract_state, target).compile()
    hlo = compiled.as_text()

    # ---- parse the scheduled entry computation -----------------------------
    # Instructions appear in schedule order inside ENTRY. Async collectives
    # are `X-start` / `X-done` pairs; whatever is scheduled between them runs
    # under the collective.
    entry = hlo.split("ENTRY ")[1]
    lines = [l.strip() for l in entry.splitlines() if "=" in l]
    coll_re = re.compile(
        r"(all-gather|reduce-scatter|all-reduce|all-to-all|collective-permute)"
        r"(-start|-done)?"
    )
    compute_re = re.compile(r"fusion|custom-call|convolution|dot|sort")
    open_colls = {}  # name -> (kind, start_idx, [overlapped compute lines])
    report = []
    for idx, line in enumerate(lines):
        lhs = line.split("=")[0].strip().lstrip("%")
        m = coll_re.search(line.split("=", 1)[1])
        if m and m.group(2) == "-start":
            open_colls[lhs.replace("-start", "")] = (m.group(1), idx, [])
        elif m and m.group(2) == "-done":
            key = None
            for k in list(open_colls):
                if k in line:
                    key = k
                    break
            if key is None and open_colls:
                key = next(iter(open_colls))
            if key is not None:
                kind, start_idx, overlapped = open_colls.pop(key)
                report.append(
                    {
                        "collective": kind,
                        "var": key,
                        "scheduled_ops_in_flight": len(overlapped),
                        "compute_ops_in_flight": sum(
                            1 for l in overlapped if compute_re.search(l)
                        ),
                        "in_flight_examples": [
                            l.split("=")[0].strip()[:60] for l in overlapped[:6]
                        ],
                    }
                )
        else:
            for k in open_colls:
                open_colls[k][2].append(line)

    sync_colls = sum(
        1 for l in lines
        if coll_re.search(l.split("=", 1)[1])
        and not re.search(r"-(start|done)", l.split("=", 1)[1])
    )

    n_async = len(report)
    n_overlapped = sum(1 for r in report if r["compute_ops_in_flight"] > 0)
    summary = {
        "topology": "v5e:2x4 (8 chips, AOT)",
        "n": n,
        "resolution": [W, H],
        "async_collectives": n_async,
        "async_with_compute_in_flight": n_overlapped,
        "sync_collectives": sync_colls,
        "pairs": report,
    }
    with open("docs/overlap_schedule.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "pairs"}))
    for r in report:
        print(
            f"  {r['collective']:<20} ops_in_flight={r['scheduled_ops_in_flight']:>4} "
            f"compute={r['compute_ops_in_flight']:>4}  e.g. {r['in_flight_examples'][:2]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
