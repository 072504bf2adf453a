# -*- coding: utf-8 -*-
"""Multi-chip scaling: shard the tile×band batch over a device mesh.

The reference has no distributed execution at all — its parallel structure
is embarrassingly-parallel loop nests run serially over subprocesses
(SURVEY §2.3; reference tools/run_codec.py:448-563 and the per-tile loops
in the wrappers). tpukit scales the same structure the TPU way:

  * mesh axes ("dp", "sp"): data-parallel over independent tiles, and
    spectral-parallel over the band axis for the metric reductions (the
    180-band axis is the only long "sequence" in this workload,
    SURVEY §5.7);
  * work is expressed as one jitted step with NamedSharding constraints —
    GSPMD inserts the all-gathers/psums (over ICI) where the codec model
    needs whole-cube streams or the metrics need cross-band totals;
  * scalar results replicate; nothing rides DCN because tiles are
    independent.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpukit.codecs import ccsds121 as ck_dev
from tpukit.metrics.quality import quality_stats
from tpukit.metrics.spectral import spectral_stats


def make_mesh(devices: Optional[Sequence] = None, dp: Optional[int] = None,
              sp: int = 1) -> Mesh:
    """Build a ("dp","sp") mesh. Defaults: all devices on dp."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp*sp={dp * sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def analysis_step_fn(tiles: jax.Array, recons: jax.Array,
                     valid: jax.Array) -> Dict[str, jax.Array]:
    """One fused benchmark step over a batch of tiles: exact CCSDS-121
    stream size per tile (encoder model) + full quality and spectral
    metrics. tiles/recons: (T, B, H, W) uint16-ring; valid: (T, H, W).

    This is the framework's flagship compute graph: what the reference
    does with per-tile subprocesses + numpy passes (run_codec.py:472-529)
    becomes one compiled program over the batch.
    """
    T, B, H, W = tiles.shape

    def per_tile(cube, rec, vm):
        flat = jnp.moveaxis(cube, 0, -1).reshape(-1)  # BIP stream order
        size = ck_dev.encode_size(flat)
        q = quality_stats(cube.astype(jnp.int32), rec.astype(jnp.int32), vm)
        s = spectral_stats(cube.astype(jnp.int32), rec.astype(jnp.int32), vm)
        return {"bitstream_bytes": size, "quality": q, "spectral": s}

    return jax.vmap(per_tile)(tiles, recons, valid)


def sharded_analysis_step(mesh: Mesh):
    """jit analysis_step_fn with tile batches sharded (dp) and the band
    axis sharded (sp)."""
    tile_sharding = NamedSharding(mesh, P("dp", "sp", None, None))
    mask_sharding = NamedSharding(mesh, P("dp", None, None))
    out_sharding = NamedSharding(mesh, P("dp"))

    return jax.jit(
        analysis_step_fn,
        in_shardings=(tile_sharding, tile_sharding, mask_sharding),
        out_shardings={"bitstream_bytes": out_sharding,
                       "quality": out_sharding,
                       "spectral": out_sharding},
    )


def run_sharded_batch(tiles: np.ndarray, recons: np.ndarray,
                      valid: np.ndarray, mesh: Optional[Mesh] = None):
    """Host entry: place a (T,B,H,W) batch on the mesh and run the step."""
    mesh = mesh or make_mesh()
    step = sharded_analysis_step(mesh)
    out = step(jnp.asarray(tiles), jnp.asarray(recons), jnp.asarray(valid))
    return jax.tree_util.tree_map(np.asarray, out)
