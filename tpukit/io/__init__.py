"""Raster and manifest I/O: GeoTIFF (self-contained), RAW interleave,
index manifests, bit-depth packing ops."""

from tpukit.io import tiff
from tpukit.io.tiff import Dataset, Window, write_geotiff, window_transform
from tpukit.io.manifest import load_indices, load_manifest, write_manifest, guess_mask_path
from tpukit.io.bitdepth import to_12in16, trunc_klsb, effective_data_range
from tpukit.io import raw

__all__ = [
    "tiff", "Dataset", "Window", "write_geotiff", "window_transform",
    "load_indices", "load_manifest", "write_manifest", "guess_mask_path",
    "to_12in16", "trunc_klsb", "effective_data_range", "raw",
]
