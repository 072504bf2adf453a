"""Tile complexity analytics."""
from tpukit.analysis.complexity import compute_all, compute_all_arrays
