# -*- coding: utf-8 -*-
"""Multi-chip sharding on the virtual 8-device CPU mesh + graft entries."""

import numpy as np
import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_2():
    import __graft_entry__ as ge
    ge.dryrun_multichip(2)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    sizes = np.asarray(out["bitstream_bytes"])
    assert sizes.shape == (2,)
    assert (sizes > 0).all()
    me = np.asarray(out["quality"]["maxerr"])
    assert (me <= 3).all() and (me > 0).any()


def test_sharded_matches_single_device(rng):
    """Sharded execution must produce identical sizes/metrics to vmap on one
    device (collectives change layout, not math)."""
    from tpukit.parallel.mesh import make_mesh, run_sharded_batch, analysis_step_fn
    import jax.numpy as jnp
    T, B, H, W = 4, 4, 32, 32
    tiles = rng.integers(0, 4096, (T, B, H, W)).astype(np.uint16)
    recons = (tiles + rng.integers(0, 3, tiles.shape).astype(np.uint16))
    valid = rng.random((T, H, W)) > 0.2

    mesh = make_mesh(jax.devices("cpu")[:4], dp=2, sp=2)
    sharded = run_sharded_batch(tiles, recons, valid, mesh)
    single = jax.jit(analysis_step_fn)(jnp.asarray(tiles), jnp.asarray(recons),
                                       jnp.asarray(valid))
    np.testing.assert_array_equal(sharded["bitstream_bytes"],
                                  np.asarray(single["bitstream_bytes"]))
    np.testing.assert_array_equal(sharded["quality"]["maxerr"],
                                  np.asarray(single["quality"]["maxerr"]))
    np.testing.assert_allclose(sharded["quality"]["sse"],
                               np.asarray(single["quality"]["sse"]), rtol=1e-6)


def test_device_size_matches_cpp_through_step(rng):
    """End-to-end: the sharded step's size equals the real encoder output."""
    from tpukit.parallel.mesh import run_sharded_batch, make_mesh
    from tpukit.native import ccsds121_host as ck
    T, B, H, W = 2, 4, 32, 32
    tiles = rng.integers(0, 2048, (T, B, H, W)).astype(np.uint16)
    out = run_sharded_batch(tiles, tiles, np.ones((T, H, W), bool),
                            make_mesh(jax.devices("cpu")[:2], dp=2, sp=1))
    for t in range(T):
        flat = np.moveaxis(tiles[t], 0, -1).ravel()
        assert out["bitstream_bytes"][t] == len(ck.encode(flat, 16))
