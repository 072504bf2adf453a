# -*- coding: utf-8 -*-
"""CCSDS-121 block-adaptive Rice coder — TPU-native modeling path.

The reference runs this codec as an external subprocess per 512² tile
(reference tools/codecs/ccsds121/ccsds121_wrap.py:170-219). Here the whole
encoder *model* — residual mapping, per-block option costs, libaec's
stateful split-k selection, zero-run/ROS segmentation and exact output
length — runs on TPU over the full flattened cube in one jitted program:

  * unit-delay prediction + residual mapping: pure elementwise ops;
  * per-block split costs for all k at once: a (nblocks, K) shifted-sum
    table (the FLOP-heavy part, fully vectorized);
  * libaec's sequential hill-climb k-state (see native/src/ccsds121.cpp
    assess_split) collapses to ``k_b = clip(k_{b-1}, mlo_b, mhi_b)`` over
    the convex cost curve's minimizer interval [mlo, mhi]; compositions of
    clips are clips, so the whole chain is a ``jax.lax.associative_scan``
    — O(log nblocks) depth instead of a 6M-step sequential loop;
  * zero-run heads/lengths/ROS via masked cummax segmentation.

``encode_size`` returns the *exact* byte length the bit-exact C++ encoder
(and libaec, and therefore the reference's `aec` CLI) produces — validated
in tests/test_ccsds121_device.py. ``encode``/``decode`` produce/consume the
actual bitstream via the native packer.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ID_LEN = 4        # 8 < bits <= 16
KMAX = (1 << ID_LEN) - 3          # 13
SEGMENT_BLOCKS = 64


def _map_residuals(x: jax.Array, ref_period: int) -> jax.Array:
    """Unit-delay predictor + standard residual mapping; raw samples at
    reference positions (every ref_period samples)."""
    xi = x.astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), xi[:-1]])
    xmax = jnp.int32(65535)
    theta = jnp.minimum(prev, xmax - prev)
    delta = xi - prev
    d = jnp.where((delta >= 0) & (delta <= theta), 2 * delta,
                  jnp.where((delta < 0) & (-delta <= theta), -2 * delta - 1,
                            theta + jnp.abs(delta)))
    is_ref = (jnp.arange(x.shape[0], dtype=jnp.int32) % ref_period) == 0
    return jnp.where(is_ref, xi, d)


def _clip_compose(left, right):
    """Compose clamp intervals: (right ∘ left)(k) = clip(clip(k,L),R)."""
    lo_l, hi_l = left
    lo_r, hi_r = right
    lo = jnp.clip(lo_l, lo_r, hi_r)
    hi = jnp.clip(hi_l, lo_r, hi_r)
    return lo, hi


@partial(jax.jit, static_argnames=("bits", "J", "rsi"))
def analyze(x: jax.Array, bits: int = 16, J: int = 8, rsi: int = 2):
    """Full encoder model for a flattened sample stream.

    Returns a dict of per-block decisions and the exact total byte size:
      d        : (nb, J) mapped residuals (slot 0 raw on ref blocks)
      k_sel    : (nb,) selected split k (valid where option==k-split)
      option   : (nb,) 0=split,1=SE,2=nocomp,3=zero-head-or-member
      blk_bits : (nb,) emitted bits attributed to each block
      nbytes   : () total bitstream bytes
    """
    n = x.shape[0]
    assert n % J == 0, "whole blocks required"
    nb = n // J
    ref_period = J * rsi

    d_flat = _map_residuals(x, ref_period)
    d = d_flat.reshape(nb, J)
    bidx = jnp.arange(nb, dtype=jnp.int32)
    is_ref = (bidx % rsi) == 0
    m = jnp.where(is_ref, J - 1, J).astype(jnp.int32)

    # coded residuals (slot 0 excluded on ref blocks)
    slot0 = jnp.arange(J) == 0
    coded = jnp.where(is_ref[:, None] & slot0[None, :], 0, d)

    # ---- split-k cost table -------------------------------------------------
    # One (nb,) reduction per k keeps peak memory at O(nb*J), not O(nb*J*K).
    ks = jnp.arange(KMAX + 1, dtype=jnp.int32)
    fs_len = jnp.stack([jnp.sum(coded >> k, axis=1) for k in range(KMAX + 1)],
                       axis=1)  # (nb, K)
    split_len = fs_len + m[:, None] * (ks[None, :] + 1)

    # minimizer interval [mlo, mhi] of the convex split_len row
    best = jnp.min(split_len, axis=1, keepdims=True)
    is_min = split_len == best
    mlo = jnp.argmax(is_min, axis=1).astype(jnp.int32)
    mhi = (KMAX - jnp.argmax(is_min[:, ::-1], axis=1)).astype(jnp.int32)
    split_min = best[:, 0]

    # ---- second extension ---------------------------------------------------
    # int32-safe: SE can only win when the block is cheap (< nc_len bits),
    # so γ values are capped and any capped block is marked non-viable.
    GCAP = 1 << 20
    se_src = jnp.where(is_ref[:, None] & slot0[None, :], 0, d)
    a = se_src[:, 0::2]
    b = se_src[:, 1::2]
    # SE only ever wins below nc_len (≤ 16·J bits), so γ beyond GCAP is
    # irrelevant; capping the pair sum keeps γ far inside int32.
    ssum = jnp.minimum(a + b, 2048)
    gam = ssum * (ssum + 1) // 2 + jnp.minimum(b, 65535)
    gam_c = jnp.minimum(gam, GCAP)
    se_len = 1 + jnp.sum(gam_c + 1, axis=1)
    se_len = jnp.where(jnp.any(gam_c >= GCAP, axis=1), jnp.int32(1) << 28, se_len)

    nc_len = (m * bits).astype(jnp.int32)

    # ---- zero blocks --------------------------------------------------------
    allzero = jnp.all(coded == 0, axis=1)

    # k-state chain: zero blocks are identity (0, KMAX)
    lo_e = jnp.where(allzero, 0, mlo)
    hi_e = jnp.where(allzero, KMAX, mhi)
    lo_s, hi_s = jax.lax.associative_scan(_clip_compose, (lo_e, hi_e))
    k_sel = lo_s  # apply composed clamp to k_init = 0

    # per-block split length at the selected k
    split_sel = jnp.take_along_axis(split_len, k_sel[:, None], axis=1)[:, 0]

    # option choice (mirrors native emit_block: SE wins ties vs split)
    use_se = (se_len <= split_sel) & (se_len < nc_len)
    use_nc = (~use_se) & (split_sel >= nc_len)
    option = jnp.where(allzero, 3, jnp.where(use_se, 1, jnp.where(use_nc, 2, 0)))

    payload = jnp.where(use_se, se_len,
                        jnp.where(use_nc, nc_len, split_sel))
    nonzero_bits = ID_LEN + jnp.where(is_ref, bits, 0) + payload

    # ---- zero-run segmentation ---------------------------------------------
    cb = bidx % rsi                       # position within RSI chunk
    seg_break_before = (cb == 0) | (cb % SEGMENT_BLOCKS == 0)
    prev_zero = jnp.concatenate([jnp.array([False]), allzero[:-1]])
    run_start = allzero & (seg_break_before | ~prev_zero | is_ref)
    # head index for every block (cummax of start positions)
    head_pos = jnp.where(run_start, bidx, -1)
    head_idx = jax.lax.cummax(head_pos)
    # run end: next block breaks the run
    nxt_break = jnp.concatenate([
        (((cb[:-1] + 1) == rsi) | (((cb[:-1] + 1) % SEGMENT_BLOCKS) == 0)
         | ~allzero[1:] | is_ref[1:]),
        jnp.array([True])])
    run_end = allzero & nxt_break
    z = (bidx - head_idx + 1).astype(jnp.int32)
    # seg-end flush: run ends at a segment/chunk/data boundary
    at_seg_end = jnp.concatenate([
        (((cb[:-1] + 1) == rsi) | (((cb[:-1] + 1) % SEGMENT_BLOCKS) == 0)),
        jnp.array([True])])
    ros = run_end & at_seg_end & (z > 4)
    fs_bits = jnp.where(ros, 5, jnp.where(z <= 4, z, z + 1))
    head_is_ref = is_ref[jnp.clip(head_idx, 0, nb - 1)]
    marker_bits = (ID_LEN + 1 + jnp.where(head_is_ref, bits, 0) + fs_bits)
    zero_bits = jnp.where(run_end, marker_bits, 0)

    # int32 totals: callers chunk streams below 2^31 bits (256 MB output);
    # Case B tiles are ~7.5e8 bits, well inside.
    blk_bits = jnp.where(allzero, zero_bits, nonzero_bits).astype(jnp.int32)
    total_bits = jnp.sum(blk_bits)
    nbytes = (total_bits + 7) // 8

    return {
        "d": d,
        "k_sel": k_sel,
        "option": option,
        "blk_bits": blk_bits,
        "nbytes": nbytes,
        "run_end": run_end,
        "z": z,
        "ros": ros,
    }


@partial(jax.jit, static_argnames=("bits", "J", "rsi"))
def encode_size(x: jax.Array, bits: int = 16, J: int = 8, rsi: int = 2) -> jax.Array:
    """Exact compressed byte size (== native/libaec encoder output length)."""
    return analyze(x, bits=bits, J=J, rsi=rsi)["nbytes"]


# ---------------------------------------------------------------------------
# Chunked model: fixed-shape chunks => one small compiled program reused,
# with the k-state chain folded across chunks on host.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("bits", "J", "rsi"))
def chunk_totals(x: jax.Array, bits: int = 16, J: int = 8, rsi: int = 2):
    """Per-chunk encoder model parameterized by the incoming k state.

    Because the stateful k selection is ``k = clip(k_in, lo, hi)`` (see
    ``analyze``), a chunk's contribution is fully described by 14 candidate
    totals (one per possible incoming k) plus the outgoing k for each —
    the fs-cost table (the expensive part) is shared across all candidates.
    Returns (total_bits[K], k_out[K]) with K = KMAX+1.
    """
    a = analyze(x, bits=bits, J=J, rsi=rsi)
    # recompute the pieces needed for all k_in variants
    n = x.shape[0]
    nb = n // J
    d = a["d"]
    bidx = jnp.arange(nb, dtype=jnp.int32)
    is_ref = (bidx % rsi) == 0
    m = jnp.where(is_ref, J - 1, J).astype(jnp.int32)
    slot0 = jnp.arange(J) == 0
    coded = jnp.where(is_ref[:, None] & slot0[None, :], 0, d)
    ks = jnp.arange(KMAX + 1, dtype=jnp.int32)
    fs_len = jnp.stack([jnp.sum(coded >> k, axis=1) for k in range(KMAX + 1)],
                       axis=1)
    split_len = fs_len + m[:, None] * (ks[None, :] + 1)
    best = jnp.min(split_len, axis=1, keepdims=True)
    is_min = split_len == best
    mlo = jnp.argmax(is_min, axis=1).astype(jnp.int32)
    mhi = (KMAX - jnp.argmax(is_min[:, ::-1], axis=1)).astype(jnp.int32)
    allzero = jnp.all(coded == 0, axis=1)
    lo_e = jnp.where(allzero, 0, mlo)
    hi_e = jnp.where(allzero, KMAX, mhi)
    lo_s, hi_s = jax.lax.associative_scan(_clip_compose, (lo_e, hi_e))

    GCAP = 1 << 20
    se_src = coded
    aa = se_src[:, 0::2]
    bb = se_src[:, 1::2]
    ssum = jnp.minimum(aa + bb, 2048)
    gam = ssum * (ssum + 1) // 2 + jnp.minimum(bb, 65535)
    gam_c = jnp.minimum(gam, GCAP)
    se_len = 1 + jnp.sum(gam_c + 1, axis=1)
    se_len = jnp.where(jnp.any(gam_c >= GCAP, axis=1), jnp.int32(1) << 28, se_len)
    nc_len = (m * bits).astype(jnp.int32)

    zero_total = jnp.sum(jnp.where(allzero, a["blk_bits"], 0))

    def total_for(k_in):
        k_sel = jnp.clip(k_in, lo_s, hi_s)
        split_sel = jnp.take_along_axis(split_len, k_sel[:, None], axis=1)[:, 0]
        use_se = (se_len <= split_sel) & (se_len < nc_len)
        use_nc = (~use_se) & (split_sel >= nc_len)
        payload = jnp.where(use_se, se_len, jnp.where(use_nc, nc_len, split_sel))
        nz_bits = ID_LEN + jnp.where(is_ref, bits, 0) + payload
        total = jnp.sum(jnp.where(allzero, 0, nz_bits)) + zero_total
        k_out = jnp.clip(k_in, lo_s[-1], hi_s[-1])
        return total, k_out

    totals, kouts = jax.vmap(total_for)(jnp.arange(KMAX + 1, dtype=jnp.int32))
    return totals, kouts


def encode_size_chunked(x, bits: int = 16, J: int = 8, rsi: int = 2,
                        chunk: int = 1 << 22) -> int:
    """Exact encoded byte size using fixed-shape chunks.

    All per-chunk programs dispatch asynchronously (two compiled shapes at
    most: main chunk + remainder), then the tiny (nch, K) k-state tables come
    back in ONE device_get — the tunnel's device->host latency dominates, so
    one batched transfer instead of one per chunk. The exact k-state chain is
    folded on host in Python ints (no 32-bit overflow for huge streams)."""
    n = int(x.shape[0])
    step = J * rsi
    assert chunk % step == 0 and n % J == 0
    if n <= chunk:
        return int(encode_size(x, bits=bits, J=J, rsi=rsi))
    main = (n // chunk) * chunk
    rem = n - main
    results = [chunk_totals(x[i * chunk:(i + 1) * chunk], bits=bits, J=J,
                            rsi=rsi) for i in range(n // chunk)]
    if rem:
        assert rem % step == 0
        results.append(chunk_totals(x[main:], bits=bits, J=J, rsi=rsi))
    totals, kouts = jax.device_get((jnp.stack([t for t, _ in results]),
                                    jnp.stack([ko for _, ko in results])))
    k = 0
    total_bits = 0
    for t, ko in zip(totals, kouts):
        total_bits += int(t[k])
        k = int(ko[k])
    return (total_bits + 7) // 8


# ---------------------------------------------------------------------------
# Full codec API (bitstream via native packer; model on device)
# ---------------------------------------------------------------------------

def encode(samples: np.ndarray, bits: int = 16, J: int = 8, rsi: int = 2) -> bytes:
    """Produce the actual CCSDS-121 bitstream (bit-exact with libaec)."""
    from tpukit.native import ccsds121_host
    return ccsds121_host.encode(np.asarray(samples).ravel(), bits, J, rsi)


def decode(bitstream: bytes, n_samples: int, bits: int = 16, J: int = 8,
           rsi: int = 2) -> np.ndarray:
    from tpukit.native import ccsds121_host
    return ccsds121_host.decode(bitstream, n_samples, bits, J, rsi)
