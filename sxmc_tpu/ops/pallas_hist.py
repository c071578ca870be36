"""Fused Pallas histogram kernel — the hot path of the framework.

This is the TPU-native replacement for the reference's atomicAdd
``bin_samples`` CUDA kernel (reference: src/pdfz.cpp:349-408), fusing
the whole per-MCMC-step PDF rebuild into one kernel:

    HBM samples --DMA--> VMEM --> systematics --> bin ids
        --> bf16 two-level one-hot --> MXU matmul (f32 accum) --> hist

Key design points:
  * No atomics (TPUs have none): a bin id ``b`` is split into
    ``(hi, lo) = (b >> s, b & (B2-1))`` with ``B1 ~ B2 ~ sqrt(nbins)``
    and the histogram becomes the matmul
    ``onehot_hi(B1, C) @ onehot_lo(B2, C)^T -> (B1, B2)`` — bf16
    one-hots (exact 0/1) with f32 accumulation, so counts are exact.
  * One-hots are built in ``(bins, chunk)`` lane-major layout directly
    from a ``(1, C)`` id row, so no transposes of big arrays are
    needed.
  * Field math (systematic transforms) runs on ``(G, 128)``-shaped
    blocks at full sublane utilization; only the final id/valid rows are
    reshaped to ``(1, C)``.
  * The TPU grid is sequential per core, so accumulating into the same
    output block across grid steps needs no synchronization — this
    replaces the reference's atomicAdd reduction tree.
  * The validity mask (domain cut, pdfz.cpp:390-394) and the per-signal
    segment offset for batched multi-PDF builds are folded into the same
    pass.

Weighted histograms stay on this path too: the per-sample weight rides
as one extra packed row and multiplies into the hi one-hot (f32
one-hots + f32 accumulate, exact for weights).

Roofline status (measured on v5e, round 2): the compare+select one-hot
build is the floor.  Alternatives tried and rejected on hardware:
  * precomputed iota blocks passed as kernel inputs (to skip the
    per-chunk ``broadcasted_iota``) measure ~7% SLOWER at chunk 32k and
    exceed the 16 MB scoped-VMEM limit at chunk 64k — Mosaic's in-kernel
    iota is effectively free;
  * packed bf16 compares are unsupported by the target ("Target does
    not support this comparison" for vector ``arith.cmpf`` on bf16);
  * chunks above 64k blow scoped VMEM.
At b1 = b2 = 32 (1000 bins) the kernel sustains 2.2e10 samples/s,
~7.4x the reference's best published GPU number (README.md:322).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sxmc_tpu.ops import histogram as hist_ops
from sxmc_tpu.ops import transforms

LANES = 128
DEFAULT_CHUNK = 65536  # pack_samples padding granularity
_VMEM_ONEHOT_BUDGET = 12 << 20  # bytes for the one-hot pair per step


def _auto_chunk(b1: int, b2: int, bytes_per_el: int = None) -> int:
    """Largest power-of-two chunk <= DEFAULT_CHUNK whose one-hot pair
    fits the VMEM budget."""
    if bytes_per_el is None:
        bytes_per_el = 2 if b1 + b2 <= 160 else 1
    chunk = DEFAULT_CHUNK
    while chunk > 2048 and (b1 + b2) * chunk * bytes_per_el > \
            _VMEM_ONEHOT_BUDGET:
        chunk //= 2
    return chunk


def _apply_systematics_rows(cols, theta_ref, systematics):
    """Systematic transforms on (G, 128) field blocks (static unroll)."""
    for ms in systematics:
        desc, seg_mask_vec = ms
        x = cols[desc.obs]
        p = jnp.zeros_like(x)
        xi = jnp.ones_like(x)
        for i, pidx in enumerate(desc.par_indices):
            if i > 0:
                xi = xi * x
            p = p + theta_ref[0, pidx] * xi
        if desc.type == transforms.SHIFT:
            new = x + p
        elif desc.type == transforms.SCALE:
            new = x * (1.0 + p)
        elif desc.type == transforms.CTSCALE:
            new = 1.0 + (x - 1.0) * (1.0 + p)
        elif desc.type == transforms.RESOLUTION_SCALE:
            new = x + p * (x - cols[desc.extra_field])
        else:
            raise ValueError(f"bad systematic type {desc.type}")
        if seg_mask_vec is None:
            cols[desc.obs] = new
        else:
            # Per-signal application mask, indexed by the segment row.
            cols[desc.obs] = jnp.where(seg_mask_vec, new, x)
    return cols


def _balanced_split(all_bins: int):
    """Pick (b1, b2): b2 a power of two near sqrt(all_bins) in [8, 128],
    b1 ~ ceil(all_bins / b2) + 1.  One-hot cost is (b1 + b2) per sample.

    b1 is padded so b1 * b2 > all_bins always holds: the last cell is a
    guaranteed-spare "trash bin" that invalid (out-of-domain / padding)
    samples are routed to, which lets the kernels drop the per-sample
    ``& valid_row`` mask on the hi one-hot (b1 x chunk VPU ops saved per
    chunk) — the spare cell is sliced off with the rest of the padding.
    """
    b2 = 8
    while b2 < 128 and b2 * b2 < all_bins:
        b2 *= 2
    b1 = max(all_bins // b2 + 1, 1)
    shift = b2.bit_length() - 1
    return b1, b2, shift


def _make_kernel(nfields, nobs, systematics, lower, upper, nbins,
                 total_nbins, b1, b2, b2_shift, chunk, has_segments,
                 nsegments, has_weights=False):
    strides = hist_ops.bin_strides(nbins)
    scales = tuple(nbins[i] / (upper[i] - lower[i]) for i in range(nobs))
    g = chunk // LANES

    def kernel(theta_ref, samples_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # (nfields[+1][+1], G, 128) field blocks; full-sublane math.
        cols = [samples_ref[f] for f in range(nfields)]

        if has_segments:
            seg = samples_ref[nfields].astype(jnp.int32)
        else:
            seg = None
        if has_weights:
            wrow = samples_ref[nfields + (1 if has_segments else 0)]
        else:
            wrow = None

        systs = []
        for desc, sig_mask in systematics:
            if sig_mask is None or all(sig_mask):
                systs.append((desc, None))
            else:
                # Build the per-sample mask from static segment
                # comparisons (no vector gather needed on TPU).
                active = [s for s in range(nsegments) if sig_mask[s]]
                m = jnp.zeros_like(seg, dtype=jnp.bool_)
                for s in active:
                    m |= (seg == s)
                systs.append((desc, m))
        cols = _apply_systematics_rows(cols, theta_ref, systs)

        valid = jnp.ones((g, LANES), dtype=jnp.bool_)
        ids = jnp.zeros((g, LANES), dtype=jnp.int32)
        for i in range(nobs):
            x = cols[i]
            valid &= (x >= lower[i]) & (x < upper[i])
            axis = jnp.floor((x - lower[i]) * scales[i]).astype(jnp.int32)
            axis = jnp.clip(axis, 0, nbins[i] - 1)
            ids += axis * strides[i]
        if has_segments:
            ids += seg * total_nbins

        # Fold validity into the id: invalid samples route to the
        # guaranteed-spare trash cell b1*b2-1 (see _balanced_split), so
        # no per-sample mask is needed on either one-hot.  Mosaic can
        # reshape i32 vectors but not i1, so only one row relayout is
        # needed.
        ids = jnp.where(valid, ids, b1 * b2 - 1)

        # Lane-major row for the one-hot compares.
        pos = ids.reshape(1, chunk)

        # Balanced two-level split: one-hot construction costs
        # (b1 + b2) VPU ops per sample, so b1 ~ b2 ~ sqrt(nbins) halves
        # the cost vs a fixed 128-wide low level.
        lo = pos & (b2 - 1)
        hi = pos >> b2_shift
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (b2, chunk), 0)
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (b1, chunk), 0)
        # One-hot dtype (both exact for 0/1 counts): bf16 measures
        # faster for narrow splits, int8 (half the VMEM) for wide ones.
        # Weighted builds carry the per-sample weight in the hi one-hot
        # (f32 so weights keep full precision; f32 accumulate).
        if has_weights:
            onehot_lo = (lo == lo_iota).astype(jnp.float32)
            onehot_hi = (hi == hi_iota).astype(
                jnp.float32) * wrow.reshape(1, chunk)
            part = jax.lax.dot_general(
                onehot_hi, onehot_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:] += part
        elif b1 + b2 <= 160:
            onehot_lo = (lo == lo_iota).astype(jnp.bfloat16)
            onehot_hi = (hi == hi_iota).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                onehot_hi, onehot_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[:] += part.astype(jnp.int32)
        else:
            onehot_lo = (lo == lo_iota).astype(jnp.int8)
            onehot_hi = (hi == hi_iota).astype(jnp.int8)
            part = jax.lax.dot_general(
                onehot_hi, onehot_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            out_ref[:] += part

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nfields", "nobs", "systematics", "lower", "upper",
                     "nbins", "nsegments", "chunk", "has_weights",
                     "interpret"))
def pallas_histogram(
    samples_t3: jnp.ndarray,
    theta: jnp.ndarray,
    *,
    nfields: int,
    nobs: int,
    systematics: Tuple = (),
    lower: Tuple[float, ...],
    upper: Tuple[float, ...],
    nbins: Tuple[int, ...],
    nsegments: int = 1,
    chunk: Optional[int] = None,
    has_weights: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused histogram kernel.

    Args:
        samples_t3: ``(nrows, npad // 128, 128)`` f32 — field-major
            transposed samples from :func:`pack_samples`; ``nrows`` is
            ``nfields`` (+1 segment row for batched builds).  Padding
            samples must be out-of-domain.
        theta: ``(nparams,)`` systematic parameters (traced).
        systematics: static tuple of ``(SystematicDesc, signal_mask)``
            where ``signal_mask`` is None (applies to all) or a tuple of
            0/1 per segment.
        nsegments: number of PDFs for batched builds.

    Returns:
        ``(nsegments * total_nbins,)`` f32 counts.
    """
    nrows, npad_g, lanes = samples_t3.shape
    assert lanes == LANES
    npad = npad_g * LANES
    has_segments = (nrows - nfields - int(has_weights)) == 1

    total = hist_ops.total_bins(nbins)
    all_bins = nsegments * total
    b1, b2, b2_shift = _balanced_split(all_bins)
    if chunk is None:
        chunk = _auto_chunk(b1, b2)
        while npad % chunk != 0:
            chunk //= 2
    assert npad % chunk == 0, (npad, chunk)
    g = chunk // LANES

    kernel = _make_kernel(
        nfields, nobs, tuple(systematics), tuple(lower), tuple(upper),
        tuple(nbins), total, b1, b2, b2_shift, chunk, has_segments,
        nsegments, has_weights)

    theta_pad = jnp.zeros((1, max(theta.shape[0], 1)), jnp.float32)
    theta_pad = theta_pad.at[0, :theta.shape[0]].set(theta)

    grid = npad // chunk
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, theta_pad.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nrows, g, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b1, b2), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b1, b2), jnp.float32 if has_weights else jnp.int32),
        interpret=interpret,
    )(theta_pad, samples_t3)

    return out.reshape(-1)[:all_bins].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Per-segment variant: the realistic many-signal path.
#
# The global two-level split above spans nsegments * total_nbins bins, so
# its per-sample one-hot cost grows with the signal count (~355 lanes for
# the 29-signal benchmark mix, bench_sxmc.cpp:105-225).  But the samples
# arrive SORTED by segment (PdfStack concatenates per signal), so padding
# each segment up to a chunk multiple makes every grid step single-
# segment: the one-hot split then only spans total_nbins (b1 + b2 ~ 64
# for 1000 bins), and the per-segment routing collapses to one cheap
# broadcasted mask on the (nsegments, b1, b2) accumulator.


def _make_per_segment_kernel(nfields, nobs, systematics, lower, upper,
                             nbins, b1, b2, b2_shift, chunk, nsegments,
                             nchains, has_weights=False):
    strides = hist_ops.bin_strides(nbins)
    scales = tuple(nbins[i] / (upper[i] - lower[i]) for i in range(nobs))
    g = chunk // LANES
    batched = nchains is not None
    nch = nchains if batched else 1

    def kernel(theta_ref, seg_map_ref, mask_ref, samples_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        sid = seg_map_ref[0, pl.program_id(0)]

        raw_cols = [samples_ref[f] for f in range(nfields)]
        if has_weights:
            wrow = samples_ref[nfields].reshape(1, chunk)
        else:
            wrow = None

        # Per-chunk systematic activity: a scalar load from the SMEM
        # mask matrix replaces the per-sample segment-compare masks of
        # the global kernel.
        seg_iota = jax.lax.broadcasted_iota(
            jnp.int32, (out_ref.shape[0] if not batched else
                        out_ref.shape[1], b1, 1), 0)
        seg_onehot = (seg_iota == sid).astype(jnp.float32)

        for c in range(nch):
            systs = []
            for desc, mrow in systematics:
                if mrow is None:
                    systs.append((desc, None))
                else:
                    on = mask_ref[mrow, sid] > 0
                    systs.append((desc, on))
            cols = list(raw_cols)
            for desc, on in systs:
                x = cols[desc.obs]
                p = jnp.zeros_like(x)
                xi = jnp.ones_like(x)
                for i, pidx in enumerate(desc.par_indices):
                    if i > 0:
                        xi = xi * x
                    p = p + theta_ref[c, pidx] * xi
                if desc.type == transforms.SHIFT:
                    new = x + p
                elif desc.type == transforms.SCALE:
                    new = x * (1.0 + p)
                elif desc.type == transforms.CTSCALE:
                    new = 1.0 + (x - 1.0) * (1.0 + p)
                elif desc.type == transforms.RESOLUTION_SCALE:
                    new = x + p * (x - cols[desc.extra_field])
                else:
                    raise ValueError(f"bad systematic type {desc.type}")
                if on is None:
                    cols[desc.obs] = new
                else:
                    cols[desc.obs] = jnp.where(on, new, x)

            valid = jnp.ones((g, LANES), dtype=jnp.bool_)
            ids = jnp.zeros((g, LANES), dtype=jnp.int32)
            for i in range(nobs):
                x = cols[i]
                valid &= (x >= lower[i]) & (x < upper[i])
                axis = jnp.floor(
                    (x - lower[i]) * scales[i]).astype(jnp.int32)
                axis = jnp.clip(axis, 0, nbins[i] - 1)
                ids += axis * strides[i]
            # Invalid samples -> guaranteed-spare trash cell (see
            # _balanced_split); no mask needed on the one-hots.
            ids = jnp.where(valid, ids, b1 * b2 - 1)

            pos = ids.reshape(1, chunk)
            lo = pos & (b2 - 1)
            hi = pos >> b2_shift
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (b2, chunk), 0)
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (b1, chunk), 0)
            if has_weights:
                # f32 one-hots so the per-sample weight keeps full
                # precision through the MXU accumulate.
                onehot_lo = (lo == lo_iota).astype(jnp.float32)
                onehot_hi = (hi == hi_iota).astype(jnp.float32) * wrow
            else:
                onehot_lo = (lo == lo_iota).astype(jnp.bfloat16)
                onehot_hi = (hi == hi_iota).astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                onehot_hi, onehot_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # Route the (b1, b2) partial into this chunk's segment row.
            if batched:
                out_ref[c] += seg_onehot * part[None, :, :]
            else:
                out_ref[:] += seg_onehot * part[None, :, :]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nfields", "nobs", "systematics", "lower", "upper",
                     "nbins", "nsegments", "chunk", "interpret"))
def pallas_histogram_segmented(
    samples_t3: jnp.ndarray,
    chunk_seg: jnp.ndarray,
    mask_matrix: jnp.ndarray,
    theta: jnp.ndarray,
    *,
    nfields: int,
    nobs: int,
    systematics: Tuple = (),
    lower: Tuple[float, ...],
    upper: Tuple[float, ...],
    nbins: Tuple[int, ...],
    nsegments: int,
    chunk: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-segment fused histogram: one signal per grid step.

    Args:
        samples_t3: packed samples from :func:`pack_samples_per_segment`
            (``(nfields, npad // 128, 128)``; every chunk single-segment).
        chunk_seg: ``(1, nchunks)`` int32 — segment id of each chunk.
        mask_matrix: ``(nmasked, nsegments)`` int32 — row r holds the
            per-segment application mask of the r-th masked systematic
            (1 row minimum).
        theta: ``(nparams,)`` for one build or ``(nchains, nparams)``
            for a batched multi-chain build (chains share the samples;
            one kernel reads each chunk once and unrolls the chains).
        systematics: static tuple of ``(SystematicDesc, mask_row)`` with
            ``mask_row`` None (all segments) or an int row into
            ``mask_matrix``.

    Returns:
        ``(nsegments * total_nbins,)`` f32 counts, or
        ``(nchains, nsegments * total_nbins)`` when theta is 2-D.
    """
    nrows, npad_g, lanes = samples_t3.shape
    assert lanes == LANES and nrows in (nfields, nfields + 1)
    has_weights = nrows == nfields + 1
    npad = npad_g * LANES
    assert npad % chunk == 0
    g = chunk // LANES
    grid = npad // chunk

    total = hist_ops.total_bins(nbins)
    b1, b2, b2_shift = _balanced_split(total)

    batched = theta.ndim == 2
    nchains = theta.shape[0] if batched else None
    theta2 = theta if batched else theta[None, :]
    npar = max(theta2.shape[1], 1)
    theta_pad = jnp.zeros((theta2.shape[0], npar), jnp.float32)
    theta_pad = theta_pad.at[:, :theta2.shape[1]].set(theta2)

    kernel = _make_per_segment_kernel(
        nfields, nobs, tuple(systematics), tuple(lower), tuple(upper),
        tuple(nbins), b1, b2, b2_shift, chunk, nsegments, nchains,
        has_weights)

    out_shape = ((nchains, nsegments, b1, b2) if batched
                 else (nsegments, b1, b2))
    out_block = out_shape
    nmask = mask_matrix.shape[0]

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((theta_pad.shape[0], npar), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, grid), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nmask, nsegments), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nrows, g, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            out_block, (lambda i: (0, 0, 0, 0)) if batched
            else (lambda i: (0, 0, 0)),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=interpret,
    )(theta_pad, chunk_seg, mask_matrix, samples_t3)

    flat = out.reshape(*out_shape[:-2], b1 * b2)[..., :total]
    if batched:
        return flat.reshape(nchains, nsegments * total)
    return flat.reshape(nsegments * total)


def pick_segment_chunk(counts) -> int:
    """Chunk size for the per-segment kernel: as large as possible for
    DMA/VPU efficiency while keeping per-segment padding waste small
    (each segment pads up to a chunk multiple, ~chunk/2 average)."""
    counts = np.asarray(counts)
    avg = max(float(counts.mean()) if counts.size else 0.0, 1.0)
    chunk = 8192
    while chunk < 65536 and chunk * 4 <= avg:
        chunk *= 2
    return chunk


def pack_samples_per_segment(
    samples: np.ndarray,
    lower: Sequence[float],
    segment_ids: np.ndarray,
    nsegments: int,
    chunk: int = 16384,
    weights: Optional[np.ndarray] = None,
):
    """Host-side packing for the per-segment kernel.

    Sorts rows by segment (stable; PdfStack input is already sorted)
    and pads every segment up to a multiple of ``chunk`` with
    out-of-domain rows, so each kernel chunk holds exactly one segment.
    ``weights`` (optional) ride as one extra row (pad weight 0).

    Returns:
        (packed, chunk_seg): ``(nfields[+1], npad/128, 128)`` f32 and
        ``(1, nchunks)`` int32 segment-of-chunk map.
    """
    samples = np.asarray(samples, np.float32)
    segment_ids = np.asarray(segment_ids, np.int64)
    n, nfields = samples.shape
    order = np.argsort(segment_ids, kind="stable")
    if not np.array_equal(order, np.arange(n)):
        samples = samples[order]
        segment_ids = segment_ids[order]
        if weights is not None:
            weights = np.asarray(weights, np.float32)[order]

    counts = np.bincount(segment_ids, minlength=nsegments)
    padded_counts = np.maximum(-(-counts // chunk) * chunk, chunk)
    npad = int(padded_counts.sum())

    nrows = nfields + (1 if weights is not None else 0)
    out = np.full((nrows, npad), np.float32(lower[0] - 1e9), np.float32)
    if weights is not None:
        out[nfields] = 0.0
    chunk_seg = np.empty(npad // chunk, np.int32)
    dst = 0
    src = 0
    for s in range(nsegments):
        c = int(counts[s])
        out[:nfields, dst:dst + c] = samples[src:src + c].T
        if weights is not None:
            out[nfields, dst:dst + c] = weights[src:src + c]
        chunk_seg[dst // chunk:(dst + padded_counts[s]) // chunk] = s
        dst += int(padded_counts[s])
        src += c
    return (out.reshape(nrows, npad // LANES, LANES),
            chunk_seg[None, :])


def pack_samples(
    samples: np.ndarray,
    lower: Sequence[float],
    segment_ids: Optional[np.ndarray] = None,
    weights: Optional[np.ndarray] = None,
    chunk: int = DEFAULT_CHUNK,
) -> np.ndarray:
    """Host-side packing: (n, nfields) -> (nrows, npad/128, 128) f32.

    Pads the sample count up to a multiple of ``chunk`` with
    out-of-domain values (they fail the domain cut, contributing
    nothing, pdfz.cpp:390-394).  When ``segment_ids`` is given it is
    appended as an extra row for batched multi-PDF builds; ``weights``
    as a further row for weighted histograms (an extension the
    reference planned but withdrew, SURVEY.md section 4).
    """
    samples = np.asarray(samples, np.float32)
    n, nfields = samples.shape
    npad = -(-n // chunk) * chunk

    nrows = (nfields + (1 if segment_ids is not None else 0)
             + (1 if weights is not None else 0))
    out = np.empty((nrows, npad), np.float32)
    pad_value = np.float32(lower[0] - 1e9)
    for f in range(nfields):
        out[f, :n] = samples[:, f]
        out[f, n:] = pad_value
    row = nfields
    if segment_ids is not None:
        out[row, :n] = segment_ids
        out[row, n:] = 0
        row += 1
    if weights is not None:
        out[row, :n] = np.asarray(weights, np.float32)
        out[row, n:] = 0.0
    return out.reshape(nrows, npad // LANES, LANES)


# ---------------------------------------------------------------------------
# Fused LUT evaluation: the TPU replacement for the reference ``eval_pdf``
# gather kernel (pdfz.cpp:411-436).  XLA's dynamic gather is slow on TPU;
# instead the lookup  dens[i] = hist[rb[i]]  is computed as a bilinear
# form over the same two-level one-hot split used for histogramming:
#
#     M = hist2d(b1, b2) @ onehot_lo(b2, C)      (MXU matmul)
#     dens = sum_h onehot_hi(h, C) * M(h, C)     (VPU multiply-reduce)
#
# Sentinels preserved: rb == -1 -> NaN (out of domain), rb == -2 -> 0
# (dataset mismatch).


def _make_eval_kernel(b1, b2, b2_shift, total_nbins, chunk, bin_volume,
                      nsegments):
    gp = chunk // LANES

    def kernel(hist_ref, norms_ref, rb_ref, out_ref):
        sig = pl.program_id(0)
        rb = rb_ref[0].reshape(1, chunk)
        offset = sig * total_nbins
        pos = jnp.maximum(rb, 0) + offset
        lo = pos & (b2 - 1)
        hi = pos >> b2_shift
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (b2, chunk), 0)
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (b1, chunk), 0)
        onehot_lo = (lo == lo_iota).astype(jnp.float32)
        onehot_hi = (hi == hi_iota).astype(jnp.float32)

        m = jax.lax.dot_general(
            hist_ref[:], onehot_lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot_hi * m, axis=0, keepdims=True)

        norm = norms_ref[0, sig]
        vals = counts / (norm * bin_volume)
        vals = jnp.where(rb == -2, 0.0, vals)
        vals = jnp.where(rb == -1, jnp.nan, vals)
        out_ref[0] = vals.reshape(gp, LANES)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("total_nbins", "nsegments", "bin_volume", "chunk",
                     "interpret"))
def pallas_eval_lut(
    hist_flat: jnp.ndarray,
    norms: jnp.ndarray,
    read_bins_packed: jnp.ndarray,
    *,
    total_nbins: int,
    nsegments: int,
    bin_volume: float,
    chunk: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Evaluate the (nsignals, npoints) LUT from histogram counts.

    Args:
        hist_flat: ``(nsegments * total_nbins,)`` f32 counts (the output
            of :func:`pallas_histogram`).
        norms: ``(nsegments,)`` f32 in-domain counts.
        read_bins_packed: ``(nsegments, npad // 128, 128)`` int32 from
            :func:`pack_read_bins` (pad entries -2).

    Returns:
        ``(nsegments, npad)`` f32 PDF values (slice to npoints outside).
    """
    nseg, npad_g, lanes = read_bins_packed.shape
    assert lanes == LANES and nseg == nsegments
    npad = npad_g * LANES
    all_bins = nsegments * total_nbins
    b1, b2, b2_shift = _balanced_split(all_bins)
    if chunk is None:
        chunk = _auto_chunk(b1, b2, bytes_per_el=4)
        while npad % chunk != 0:
            chunk //= 2
    assert npad % chunk == 0

    hist2d = jnp.zeros((b1 * b2,), jnp.float32
                       ).at[:all_bins].set(hist_flat).reshape(b1, b2)
    norms_row = jnp.zeros((1, max(nsegments, 1)), jnp.float32
                          ).at[0, :].set(norms)

    kernel = _make_eval_kernel(b1, b2, b2_shift, total_nbins, chunk,
                               bin_volume, nsegments)
    gp = chunk // LANES
    grid = (nsegments, npad // chunk)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b1, b2), lambda s, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(nsegments, 1)), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, gp, LANES), lambda s, i: (s, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, gp, LANES), lambda s, i: (s, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsegments, npad // LANES, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(hist2d, norms_row, read_bins_packed)
    return out.reshape(nsegments, npad)


def pack_read_bins(read_bins, chunk: int = DEFAULT_CHUNK):
    """(nsignals, npoints) int32 -> (nsignals, npad/128, 128), pad -2."""
    rb = np.asarray(read_bins, np.int32)
    if rb.ndim == 1:
        rb = rb[None, :]
    nsig, n = rb.shape
    npad = -(-n // chunk) * chunk
    out = np.full((nsig, npad), -2, np.int32)
    out[:, :n] = rb
    return out.reshape(nsig, npad // LANES, LANES)
