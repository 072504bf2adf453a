"""Device-fused quality, spectral, and link metrics."""

from tpukit.metrics.quality import (
    quality_stats, quality_stats_batched, assemble_quality, compute_metrics)
from tpukit.metrics.spectral import spectral_stats, compute_sam_sid_lmse, sobel_mag
from tpukit.metrics.link import LinkModel, link_for_case

__all__ = [
    "quality_stats", "quality_stats_batched", "assemble_quality",
    "compute_metrics", "spectral_stats", "compute_sam_sid_lmse", "sobel_mag",
    "LinkModel", "link_for_case",
]
