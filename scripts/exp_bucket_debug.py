"""Bisect the P2 in-register bucket-permutation miscompile (round 5).

exp_bucket_dma.py's P2 (stable 128-lane bucket grouping as comparison algebra
+ one-hot matmuls) passes interpret mode but produces wrong results compiled
on v5e. This script splits the algebra into one mini-kernel per intermediate
and checks each against numpy, so a single hardware run localizes the
miscompiling step. Also probes two alternative formulations (int compares /
unrolled per-bucket masked accumulation) as potential sidesteps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_bucket_debug.py
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 128


INTERPRET = jax.default_backend() != "tpu"


def _run(kernel, outs, *inputs):
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in outs),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in outs),
        interpret=INTERPRET,
    )(*inputs)
    return [np.asarray(o) for o in out]


def _algebra(bucket):
    """The P2 algebra, returning every intermediate. bucket: (1, g) f32."""
    g = G
    bi = jnp.broadcast_to(bucket, (g, g))  # bi[i, c] = bucket[c]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    ).astype(jnp.float32)
    bT = jax.lax.dot_general(  # (g, 1) matmul transpose
        eye, bucket, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    bj = jnp.broadcast_to(bT, (g, g))  # bj[i, c] = bucket[i]
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    less = (bi < bj).astype(jnp.float32)
    same_before = ((bj == bi) & (col < row)).astype(jnp.float32)
    ones = jnp.ones((g, 1), jnp.float32)
    dst = jax.lax.dot_general(
        less + same_before, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (g, 1)
    PT = (
        jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)
        == jnp.broadcast_to(dst, (g, g))
    ).astype(jnp.float32)
    return bi, bT, bj, less, same_before, dst, PT


def main():
    g = G
    rng = np.random.default_rng(1)
    buckets = rng.integers(0, 16, g).astype(np.int32)
    x = rng.normal(size=(16, g)).astype(np.float32)
    bucket_j = jnp.asarray(buckets).reshape(1, g).astype(jnp.float32)
    x_j = jnp.asarray(x)

    # ---- numpy ground truth -------------------------------------------------
    b = buckets.astype(np.float32)
    bi_w = np.broadcast_to(b[None, :], (g, g))
    bj_w = np.broadcast_to(b[:, None], (g, g))
    col = np.broadcast_to(np.arange(g)[None, :], (g, g))
    row = np.broadcast_to(np.arange(g)[:, None], (g, g))
    less_w = (bi_w < bj_w).astype(np.float32)
    same_w = ((bj_w == bi_w) & (col < row)).astype(np.float32)
    dst_w = (less_w + same_w).sum(axis=1)  # (g,)
    PT_w = (np.arange(g)[None, :] == dst_w[:, None]).astype(np.float32)
    order = np.argsort(buckets, kind="stable")
    out_w = x[:, order]

    # ---- kernel dumping all intermediates ----------------------------------
    def k_all(b_ref, o_bj, o_less, o_same, o_dst, o_pt):
        bi, bT, bj, less, same_before, dst, PT = _algebra(b_ref[0:1, :])
        o_bj[:, :] = bj
        o_less[:, :] = less
        o_same[:, :] = same_before
        o_dst[:, :] = jnp.broadcast_to(dst, (G, G))
        o_pt[:, :] = PT

    bj_o, less_o, same_o, dst_o, pt_o = _run(
        k_all, [(g, g)] * 5, bucket_j
    )
    print("bj      :", "OK" if np.array_equal(bj_o, bj_w) else "MISMATCH")
    print("less    :", "OK" if np.array_equal(less_o, less_w) else "MISMATCH")
    print("same_bef:", "OK" if np.array_equal(same_o, same_w) else "MISMATCH")
    dst_ok = np.array_equal(dst_o[:, 0], dst_w)
    print("dst     :", "OK" if dst_ok else "MISMATCH")
    if not dst_ok:
        bad = np.nonzero(dst_o[:, 0] != dst_w)[0]
        print("  bad rows:", bad[:16], "got", dst_o[bad[:8], 0], "want", dst_w[bad[:8]])
    print("PT      :", "OK" if np.array_equal(pt_o, PT_w) else "MISMATCH")

    # ---- final matmul alone, with host-computed correct PT ------------------
    def k_mm(x_ref, pt_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            x_ref[:, :], pt_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    (mm_o,) = _run(k_mm, [(16, g)], x_j, jnp.asarray(PT_w))
    print("x@PT(host PT):", "OK" if np.allclose(mm_o, out_w) else "MISMATCH")

    # ---- alternative A: int comparisons (bj via f32 matmul, cast back) -----
    def k_int(b_ref, o_dst, o_pt):
        bucket = b_ref[0:1, :].astype(jnp.float32)
        bi_i = jnp.broadcast_to(b_ref[0:1, :], (g, g))
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        ).astype(jnp.float32)
        bT = jax.lax.dot_general(
            eye, bucket, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bj_i = jnp.broadcast_to(bT, (g, g)).astype(jnp.int32)
        colx = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        rowx = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        less = (bi_i < bj_i).astype(jnp.float32)
        same_before = ((bj_i == bi_i) & (colx < rowx)).astype(jnp.float32)
        ones = jnp.ones((g, 1), jnp.float32)
        dst = jax.lax.dot_general(
            less + same_before, ones, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_dst[:, :] = jnp.broadcast_to(dst, (g, g))
        PT = (
            jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
            == jnp.broadcast_to(dst, (g, g)).astype(jnp.int32)
        ).astype(jnp.float32)
        o_pt[:, :] = PT

    dst_i, pt_i = _run(k_int, [(g, g)] * 2, jnp.asarray(buckets).reshape(1, g))
    print("int dst :", "OK" if np.array_equal(dst_i[:, 0], dst_w) else "MISMATCH")
    print("int PT  :", "OK" if np.array_equal(pt_i, PT_w) else "MISMATCH")

    # ---- alternative B: dst via row-space contraction (no (g,1) anywhere) --
    # dst_row[c] = Σ_{c'} pred[c', c] computed as ones(1,g) @ M, keeping every
    # tensor (1, g) or (g, g); PT built from dst_row via a second eye-matmul
    # transpose of the PACKED one-hot rows: P[c, d] = [dst[c] == d] directly
    # needs dst on sublanes, so instead build P^T columns: PT[s, d] =
    # [dst_row[s] == d] — transpose dst_row to sublanes with the eye matmul.
    def k_alt(b_ref, x_ref, o_dst, o_pt, o_out):
        bucket = b_ref[0:1, :].astype(jnp.float32)
        bi = jnp.broadcast_to(bucket, (g, g))  # bi[r, c] = bucket[c]
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        ).astype(jnp.float32)
        bT = jax.lax.dot_general(
            eye, bucket, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bj = jnp.broadcast_to(bT, (g, g))  # bj[r, c] = bucket[r]
        colx = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        rowx = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        # pred[r, c] = 1 if lane r sorts strictly before lane c (stable)
        pred = ((bj < bi) | ((bj == bi) & (rowx < colx))).astype(jnp.float32)
        onesr = jnp.ones((1, g), jnp.float32)
        dst_row = jax.lax.dot_general(  # (1, g): dst of lane c on lanes
            onesr, pred, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_dst[:, :] = jnp.broadcast_to(dst_row, (g, g))
        dstT = jax.lax.dot_general(  # (g, 1) via the same eye transpose
            eye, dst_row, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        PT = (
            jax.lax.broadcasted_iota(jnp.int32, (g, g), 1).astype(jnp.float32)
            == jnp.broadcast_to(dstT, (g, g))
        ).astype(jnp.float32)
        o_pt[:, :] = PT
        o_out[:, :] = jax.lax.dot_general(
            x_ref[:, :], PT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dst_b, pt_b, out_b = _run(
        k_alt, [(g, g), (g, g), (16, g)], bucket_j, x_j
    )
    print("altB dst:", "OK" if np.array_equal(dst_b[0, :], dst_w) else "MISMATCH")
    print("altB PT :", "OK" if np.array_equal(pt_b, PT_w) else "MISMATCH")
    print("altB out:", "OK" if np.allclose(out_b, out_w) else "MISMATCH")


if __name__ == "__main__":
    main()
