"""MXU-native histogramming.

TPU re-design of the reference ``bin_samples`` CUDA kernel
(reference: src/pdfz.cpp:349-408).  The reference scatters with
``atomicAdd``; TPUs have no atomics, and XLA scatter-add serializes.
Instead we histogram with a *two-level one-hot matmul*:

    split each bin id b into  (hi, lo) = (b // B2, b % B2)
    A[k, h] = w_k * [hi_k == h]        (nsamples, B1)
    B[k, l] = [lo_k == l]              (nsamples, B2)
    hist2d  = A^T @ B                  (B1, B2)  -- MXU matmul
    hist    = hist2d.reshape(-1)[:total_nbins]

Building the one-hots costs O(n * (B1 + B2)) cheap VPU compares instead of
O(n * total_nbins), and the O(n * total_nbins) inner product runs on the
MXU at matmul rates.  Counts accumulate in f32, which is exact for sums of
0/1 weights up to 2**24 per partial sum.

Bin-index semantics match the reference exactly (pdfz.cpp:388-398):
an event is in-domain iff ``lower <= x < upper`` for every observable, and
the flat bin id is ``sum_i int((x_i - lower_i) * nbins_i / span_i) * stride_i``
with row-major strides (pdfz.cpp:207-215).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_LANES = 128


def bin_strides(nbins: Sequence[int]) -> Tuple[int, ...]:
    """Row-major bin strides (reference: pdfz.cpp:207-215)."""
    ndims = len(nbins)
    strides = [1] * ndims
    for i in range(ndims - 2, -1, -1):
        strides[i] = nbins[i + 1] * strides[i + 1]
    return tuple(strides)


def total_bins(nbins: Sequence[int]) -> int:
    t = 1
    for n in nbins:
        t *= n
    return t


def bin_volume(lower: Sequence[float], upper: Sequence[float],
               nbins: Sequence[int]) -> float:
    """Volume of one bin (reference: pdfz.cpp:201-204)."""
    v = 1.0
    for lo, up, n in zip(lower, upper, nbins):
        v *= (up - lo) / n
    return v


def compute_bin_ids(
    obs: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    nbins: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flat bin ids + in-domain mask for points.

    Args:
        obs: ``(n, nobs)`` observable columns (already transformed).
        lower/upper: ``(nobs,)`` domain bounds.
        nbins: static per-observable bin counts.

    Returns:
        (ids, valid): ``(n,)`` int32 flat bin ids (clipped into range for
        invalid points) and ``(n,)`` bool in-domain mask.
    """
    strides = bin_strides(nbins)
    nbins_arr = jnp.asarray(nbins, dtype=obs.dtype)
    scale = nbins_arr / (upper - lower)

    # [lower, upper) convention, per observable (pdfz.cpp:388-394).
    valid = jnp.all((obs >= lower) & (obs < upper), axis=1)

    # Truncation toward zero == floor for non-negative arguments; clip so
    # out-of-domain points still produce an in-range (masked) id.
    per_axis = jnp.floor((obs - lower) * scale).astype(jnp.int32)
    per_axis = jnp.clip(per_axis, 0, jnp.asarray(nbins, jnp.int32) - 1)
    ids = per_axis @ jnp.asarray(strides, dtype=jnp.int32)
    return ids, valid


def _onehot_matmul_hist(
    ids: jnp.ndarray,
    weights: jnp.ndarray,
    nbins_padded: int,
) -> jnp.ndarray:
    """Histogram one chunk: (B1, B2) = onehot_hi^T @ onehot_lo."""
    b2 = _LANES if nbins_padded >= _LANES else nbins_padded
    b1 = nbins_padded // b2
    hi = ids // b2
    lo = ids % b2
    a = (hi[:, None] == jnp.arange(b1, dtype=jnp.int32)[None, :])
    b = (lo[:, None] == jnp.arange(b2, dtype=jnp.int32)[None, :])
    a = a.astype(jnp.float32) * weights[:, None].astype(jnp.float32)
    b = b.astype(jnp.float32)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def fixed_bincount(
    ids: jnp.ndarray,
    weights: jnp.ndarray,
    num_bins: int,
    chunk: int = 1 << 16,
) -> jnp.ndarray:
    """Weighted bincount with a static bin count, MXU-friendly.

    Replaces the reference's atomicAdd scatter (pdfz.cpp:401-404).  The
    sample axis is processed in chunks under ``lax.scan`` so the one-hot
    intermediates stay small enough to fuse on-chip.

    Args:
        ids: ``(n,)`` int32 bin ids in ``[0, num_bins)``.
        weights: ``(n,)`` per-sample weights (use the validity mask, or the
            mask times sample weights for weighted PDFs).
        num_bins: static number of bins.
        chunk: samples per scan step.

    Returns:
        ``(num_bins,)`` f32 counts.
    """
    n = ids.shape[0]
    b2 = _LANES if num_bins >= _LANES else max(num_bins, 1)
    padded = -(-num_bins // b2) * b2

    if n <= chunk:
        hist2d = _onehot_matmul_hist(ids, weights, padded)
        return hist2d.reshape(-1)[:num_bins]

    nchunks = -(-n // chunk)
    pad = nchunks * chunk - n
    ids_p = jnp.pad(ids, (0, pad))
    w_p = jnp.pad(weights, (0, pad))
    ids_c = ids_p.reshape(nchunks, chunk)
    w_c = w_p.reshape(nchunks, chunk)

    def step(acc, xs):
        cids, cw = xs
        return acc + _onehot_matmul_hist(cids, cw, padded), None

    b1 = padded // b2
    init = jnp.zeros((b1, b2), jnp.float32)
    hist2d, _ = jax.lax.scan(step, init, (ids_c, w_c))
    return hist2d.reshape(-1)[:num_bins]


@functools.partial(jax.jit, static_argnames=("nbins", "num_segments", "chunk"))
def segmented_histogram(
    obs: jnp.ndarray,
    segment_ids: jnp.ndarray,
    mask: jnp.ndarray,
    lower: jnp.ndarray,
    upper: jnp.ndarray,
    nbins: Tuple[int, ...],
    num_segments: int,
    weights: Optional[jnp.ndarray] = None,
    chunk: int = 1 << 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Histogram many PDFs that share one binning, in a single fused op.

    This replaces the reference's one-CUDA-stream-per-PDF concurrency
    (pdfz.h:17-22, mcmc.cpp:264-271): all signals' samples are concatenated
    with a segment id, and per-signal histograms become one batched
    bincount over ``num_segments * total_nbins`` bins.

    Args:
        obs: ``(n, nobs)`` concatenated (transformed) observable columns.
        segment_ids: ``(n,)`` int32 signal index per sample.
        mask: ``(n,)`` bool validity (e.g. padding mask).
        lower/upper: shared domain bounds, ``(nobs,)``.
        nbins: static per-observable bin counts.
        num_segments: static number of PDFs.
        weights: optional per-sample weights.

    Returns:
        (hists, norms): ``(num_segments, total_nbins)`` f32 counts and
        ``(num_segments,)`` f32 in-domain sums (the per-PDF normalizations,
        reference pdfz.cpp:370-407).
    """
    tb = total_bins(nbins)
    ids, valid = compute_bin_ids(obs, lower, upper, nbins)
    w = (valid & mask).astype(jnp.float32)
    if weights is not None:
        w = w * weights
    flat_ids = segment_ids * tb + ids
    flat = fixed_bincount(flat_ids, w, num_segments * tb, chunk=chunk)
    hists = flat.reshape(num_segments, tb)
    norms = hists.sum(axis=1)
    return hists, norms
