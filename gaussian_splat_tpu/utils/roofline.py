"""Roofline accounting for the tile-rasterization kernels.

The north star asks for ≥95%-of-roofline on the tile kernel; this module
computes the analytic FLOP / byte counts of the Pallas forward/backward passes
from the binning statistics, so benchmarks can report achieved vs. attainable
throughput on the measured hardware.

Model (per 128-gaussian chunk, P = tile_width·tile_height pixels):
  forward:
    VPU  ~ 22 ops over (P, G)  (falloff, masks, log1p, exp, weights)
    MXU  ~ 2·P·G·G (prefix matmul) + 2·P·G·3 (color matmul) FLOPs
    HBM  ~ NFEAT·G·4 bytes streamed in per chunk (+ tile outputs once)
  backward ≈ 2.1× forward FLOPs + the gradient write-back per chunk.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

# v5e single-chip peaks (public numbers): 197 TFLOP/s bf16, ~½ for f32 on MXU,
# HBM ~819 GB/s. VPU: 8×128 lanes × 4 ALUs ≈ 3.8 Tops/s f32 at 940 MHz.
V5E_PEAK = {
    "mxu_f32_flops": 98.5e12,
    "vpu_f32_ops": 3.8e12,
    "hbm_bytes": 819e9,
}


@dataclasses.dataclass
class KernelCost:
    mxu_flops: float
    vpu_ops: float
    hbm_bytes: float

    def attainable_ms(self, peaks: Dict[str, float] = V5E_PEAK) -> float:
        """Roofline lower-bound runtime: max over the three limiter axes."""
        t = max(
            self.mxu_flops / peaks["mxu_f32_flops"],
            self.vpu_ops / peaks["vpu_f32_ops"],
            self.hbm_bytes / peaks["hbm_bytes"],
        )
        return t * 1e3

    def limiter(self, peaks: Dict[str, float] = V5E_PEAK) -> str:
        times = {
            "mxu": self.mxu_flops / peaks["mxu_f32_flops"],
            "vpu": self.vpu_ops / peaks["vpu_f32_ops"],
            "hbm": self.hbm_bytes / peaks["hbm_bytes"],
        }
        return max(times, key=times.get)


def forward_cost(
    num_chunks_total: int,
    num_tiles: int,
    tile_width: int = 32,
    tile_height: int = 16,
    chunk: int = 128,
    nfeat: int = 16,
    nrow: int = 8,
) -> KernelCost:
    """Analytic cost of the forward tile kernel over the whole frame.

    `num_chunks_total` = Σ_tiles ceil(count_t / chunk) — from BinningResult:
    int(jnp.sum((counts + chunk - 1) // chunk)).
    """
    p = tile_width * tile_height
    per_chunk_mxu = 2.0 * p * chunk * chunk + 2.0 * p * chunk * 3
    per_chunk_vpu = 22.0 * p * chunk
    per_chunk_hbm = nfeat * chunk * 4.0
    out_bytes = num_tiles * nrow * p * 4.0
    return KernelCost(
        mxu_flops=num_chunks_total * per_chunk_mxu,
        vpu_ops=num_chunks_total * per_chunk_vpu,
        hbm_bytes=num_chunks_total * per_chunk_hbm + out_bytes,
    )


def backward_cost(
    num_chunks_total: int,
    num_tiles: int,
    tile_width: int = 32,
    tile_height: int = 16,
    chunk: int = 128,
    nfeat: int = 16,
    nrow: int = 8,
) -> KernelCost:
    p = tile_width * tile_height
    # fwd recompute + v/incl/drgb matmuls (3 extra P·G·G-class contractions)
    per_chunk_mxu = 2.0 * p * chunk * chunk * 2 + 2.0 * p * chunk * 3 * 2
    per_chunk_vpu = 45.0 * p * chunk
    per_chunk_hbm = nfeat * chunk * 4.0 * 2  # read feats + write grads
    io_bytes = num_tiles * nrow * p * 4.0 * 2  # fwd_out + cotangent reads
    return KernelCost(
        mxu_flops=num_chunks_total * per_chunk_mxu,
        vpu_ops=num_chunks_total * per_chunk_vpu,
        hbm_bytes=num_chunks_total * per_chunk_hbm + io_bytes,
    )
