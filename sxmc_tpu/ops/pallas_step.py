"""Fused MCMC-step kernel: histogram -> LUT gather -> log-partial-sum.

The last TPU-native component of SURVEY §2.1's NLL row: one Pallas
launch per Metropolis proposal that replaces the three-launch chain
(pallas_histogram_segmented + pallas_eval_lut + the XLA mix/log/reduce)
and never materializes the (nsignals, nevents) LUT.  Reference analog
being beaten: the fused ``finish_nll_jump_pick_combo`` kernel
(reference: src/nll_kernels.cpp:230-271), which fused only the NLL
*finish* — here the whole PDF rebuild fuses with the event term.

Grid layout (TPU grids run sequentially per core, so a later grid step
sees every earlier step's accumulator writes — the same property the
histogram kernels already rely on):

  step i < n_mc_chunks   (phase A): per-segment histogram accumulate
      into a persistent (nsignals, b1, b2) VMEM block, initialized at
      i == 0 from the precomputed static-signal rows.
  step i >= n_mc_chunks  (phase B): per event chunk, recompute the
      in-domain norms from the finished histogram (integer counts: the
      f32 sum is exact below 2^24 samples/signal), form the per-signal
      weights, gather densities via the bilinear one-hot (same split as
      pallas_eval_lut), mix them in EXACTLY nll_pair's op order, and
      accumulate compensated per-lane (hi, lo) log-sum pairs.

Outputs: the (nsignals, b1, b2) histogram table (norms / w-term /
constraints are finished by a tiny XLA epilogue in
``PdfStack.fused_nll_pair``) and the (2, g_ev, 128) event pairs.

Exactness contract: the histogram and every per-event density/mix/log
value are bit-identical to the jnp path (verified in interpret mode by
tests/test_fused_step.py).  The event-term reduction groups by
(chunk, lane) position instead of df_sum's (1024-lane) blocking, so
the final (hi, lo) pair agrees with nll_pair to the compensated
precision (~2^-48 relative), not bitwise — both are exact at the
dNLL-resolution the Metropolis accept needs.

Restrictions (callers fall back to the split path): per-segment packed
stacks only, no MC weights (norm exactness needs integer counts), no
KDE rows, no per-event NLL weights.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sxmc_tpu.ops import transforms
from sxmc_tpu.ops.pallas_hist import LANES, _balanced_split
from sxmc_tpu.ops import histogram as hist_ops

_EV_VMEM_BUDGET = 8 << 20


def pick_event_chunk(nevents: int, nsignals: int, b1: int, b2: int
                     ) -> int:
    """Largest 128-multiple event chunk whose phase-B working set
    (rb block + f32 one-hot pair + the (b1, chunk) matmul output)
    fits the VMEM budget."""
    chunk = 65536
    per_el = 4 * (nsignals + (b1 + b2) + b1)
    while chunk > 1024 and chunk * per_el > _EV_VMEM_BUDGET:
        chunk //= 2
    need = -(-max(nevents, 1) // LANES) * LANES
    return min(chunk, max(-(-need // 128) * 128, 128)) \
        if need < chunk else chunk


def _make_fused_kernel(nfields, nobs, systematics, lower, upper, nbins,
                       b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
                       n_mc_chunks, n_mc, bin_volume, nchains):
    strides = hist_ops.bin_strides(nbins)
    scales = tuple(nbins[i] / (upper[i] - lower[i]) for i in range(nobs))
    g_mc = mc_chunk // LANES
    g_ev = ev_chunk // LANES
    batched = nchains is not None
    nch = nchains if batched else 1

    def kernel(theta_ref, a_ref, chunk_seg_ref, mask_ref, hist_init_ref,
               mc_ref, rb_ref, hist_ref, ev_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            hist_ref[:] = hist_init_ref[:]
            ev_ref[:] = jnp.zeros_like(ev_ref)

        @pl.when(i < n_mc_chunks)
        def _mc_phase():
            # Identical math to pallas_hist._make_per_segment_kernel,
            # with chunk_seg carrying GLOBAL signal indices so static
            # rows keep their precomputed values untouched.
            sid = chunk_seg_ref[0, i]
            raw_cols = [mc_ref[f] for f in range(nfields)]
            seg_iota = jax.lax.broadcasted_iota(
                jnp.int32, (nsignals, b1, 1), 0)
            seg_onehot = (seg_iota == sid).astype(jnp.float32)

            for c in range(nch):
                cols = list(raw_cols)
                for desc, mrow in systematics:
                    on = None if mrow is None else mask_ref[mrow, sid] > 0
                    x = cols[desc.obs]
                    p = jnp.zeros_like(x)
                    xi = jnp.ones_like(x)
                    for k, pidx in enumerate(desc.par_indices):
                        if k > 0:
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
                        raise ValueError(
                            f"bad systematic type {desc.type}")
                    cols[desc.obs] = new if on is None else \
                        jnp.where(on, new, x)

                valid = jnp.ones((g_mc, LANES), dtype=jnp.bool_)
                ids = jnp.zeros((g_mc, LANES), dtype=jnp.int32)
                for k in range(nobs):
                    x = cols[k]
                    valid &= (x >= lower[k]) & (x < upper[k])
                    axis = jnp.floor(
                        (x - lower[k]) * scales[k]).astype(jnp.int32)
                    axis = jnp.clip(axis, 0, nbins[k] - 1)
                    ids += axis * strides[k]
                ids = jnp.where(valid, ids, b1 * b2 - 1)

                pos = ids.reshape(1, mc_chunk)
                lo = pos & (b2 - 1)
                hi = pos >> b2_shift
                lo_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (b2, mc_chunk), 0)
                hi_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (b1, mc_chunk), 0)
                onehot_lo = (lo == lo_iota).astype(jnp.bfloat16)
                onehot_hi = (hi == hi_iota).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    onehot_hi, onehot_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if batched:
                    hist_ref[c] += seg_onehot * part[None, :, :]
                else:
                    hist_ref[:] += seg_onehot * part[None, :, :]

        @pl.when(i >= n_mc_chunks)
        def _ev_phase():
            lo_iota = jax.lax.broadcasted_iota(
                jnp.int32, (b2, ev_chunk), 0)
            hi_iota = jax.lax.broadcasted_iota(
                jnp.int32, (b1, ev_chunk), 0)
            for c in range(nch):
                s = None
                for j in range(nsignals):
                    block = hist_ref[c, j] if batched else hist_ref[j]
                    # In-domain count: total minus the spare trash
                    # cell (_balanced_split) — integer-exact in f32.
                    norm = jnp.sum(block) - block[b1 - 1, b2 - 1]
                    # Same association as ops.nll.signal_weights:
                    # ((rate*nexpected) * norm) / n_mc.
                    w = (a_ref[c, j] * norm) / n_mc[j]
                    rb = rb_ref[j].reshape(1, ev_chunk)
                    pos = jnp.maximum(rb, 0)
                    olo = (pos & (b2 - 1) == lo_iota).astype(jnp.float32)
                    ohi = (pos >> b2_shift == hi_iota).astype(
                        jnp.float32)
                    m = jax.lax.dot_general(
                        block, olo, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    counts = jnp.sum(ohi * m, axis=0, keepdims=True)
                    # pallas_eval_lut's vals, then nll_pair's
                    # nan_to_num: sentinels and non-finite -> 0.
                    val = counts / (norm * bin_volume)
                    val = jnp.where(jnp.isfinite(val), val, 0.0)
                    val = jnp.where(rb < 0, 0.0, val)
                    term = w * val
                    s = term if s is None else s + term
                logs = jnp.where(s > 0,
                                 jnp.log(jnp.where(s > 0, s, 1.0)), 0.0)
                logsg = logs.reshape(g_ev, LANES)
                # Branch-free TwoSum accumulate per (row, lane).
                hi_acc = ev_ref[c, 0] if batched else ev_ref[0]
                lo_acc = ev_ref[c, 1] if batched else ev_ref[1]
                s_new = hi_acc + logsg
                bv_ = s_new - hi_acc
                err = (hi_acc - (s_new - bv_)) + (logsg - bv_)
                if batched:
                    ev_ref[c, 0] = s_new
                    ev_ref[c, 1] = lo_acc + err
                else:
                    ev_ref[0] = s_new
                    ev_ref[1] = lo_acc + err

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nfields", "nobs", "systematics", "lower", "upper",
                     "nbins", "nsignals", "mc_chunk", "ev_chunk",
                     "n_mc", "bin_volume", "interpret"))
def pallas_fused_step(
    mc_packed: jnp.ndarray,
    chunk_seg: jnp.ndarray,
    mask_matrix: jnp.ndarray,
    hist_init: jnp.ndarray,
    rb_packed: jnp.ndarray,
    theta: jnp.ndarray,
    a_coef: jnp.ndarray,
    *,
    nfields: int,
    nobs: int,
    systematics: Tuple = (),
    lower: Tuple[float, ...],
    upper: Tuple[float, ...],
    nbins: Tuple[int, ...],
    nsignals: int,
    mc_chunk: int,
    ev_chunk: int,
    n_mc: Tuple[float, ...],
    bin_volume: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused launch: rebuild + event log-sum pairs.

    Args:
        mc_packed: ``(nfields, npad_mc/128, 128)`` f32 per-segment
            packed DYNAMIC samples (pack_samples_per_segment).
        chunk_seg: ``(1, n_mc_chunks)`` int32 — GLOBAL signal index of
            each MC chunk.
        mask_matrix: ``(nmask, nsignals)`` int32 — per-signal masks of
            masked systematics, GLOBAL columns.
        hist_init: ``(nsignals, b1, b2)`` f32 — precomputed static-row
            histograms (zeros in dynamic rows and cells >= total).
        rb_packed: ``(nsignals, npad_ev/128, 128)`` int32 read bins
            (pad -2).
        theta: ``(nsyst,)`` or ``(nchains, nsyst)`` systematic params.
        a_coef: ``(nsignals,)`` or ``(nchains, nsignals)`` f32 —
            ``rates[source_id] * nexpected`` for the proposed params.
        n_mc: per-signal MC counts (static floats).

    Returns:
        ``(hist, ev_pairs)``: ``([nchains,] nsignals, b1, b2)`` f32
        counts and ``([nchains,] 2, npad_ev/128, 128)`` f32 (hi, lo)
        partial log-sum pairs.
    """
    nrows, npad_mc_g, lanes = mc_packed.shape
    assert lanes == LANES and nrows == nfields
    npad_mc = npad_mc_g * LANES
    assert npad_mc % mc_chunk == 0
    n_mc_chunks = npad_mc // mc_chunk

    nsig_rb, npad_ev_g, lanes2 = rb_packed.shape
    assert lanes2 == LANES and nsig_rb == nsignals
    npad_ev = npad_ev_g * LANES
    assert npad_ev % ev_chunk == 0
    n_ev_chunks = npad_ev // ev_chunk

    total = hist_ops.total_bins(nbins)
    b1, b2, b2_shift = _balanced_split(total)
    assert hist_init.shape[-3:] == (nsignals, b1, b2)

    batched = theta.ndim == 2
    nchains = theta.shape[0] if batched else None
    theta2 = theta if batched else theta[None, :]
    a2 = a_coef if batched else a_coef[None, :]
    npar = max(theta2.shape[1], 1)
    theta_pad = jnp.zeros((theta2.shape[0], npar), jnp.float32)
    theta_pad = theta_pad.at[:, :theta2.shape[1]].set(theta2)

    kernel = _make_fused_kernel(
        nfields, nobs, tuple(systematics), tuple(lower), tuple(upper),
        tuple(nbins), b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
        n_mc_chunks, tuple(n_mc), bin_volume, nchains)

    g_mc = mc_chunk // LANES
    g_ev = ev_chunk // LANES
    grid = n_mc_chunks + n_ev_chunks
    nmask = mask_matrix.shape[0]

    hist_shape = ((nchains, nsignals, b1, b2) if batched
                  else (nsignals, b1, b2))
    # Event pairs accumulate ACROSS event chunks into one persistent
    # block (constant index map), exactly like the histogram
    # accumulator — per-chunk output blocks would arrive uninitialized.
    ev_shape = ((nchains, 2, g_ev, LANES) if batched
                else (2, g_ev, LANES))
    hist_init_b = (jnp.broadcast_to(hist_init, hist_shape)
                   if batched and hist_init.ndim == 3 else hist_init)

    def mc_index(i):
        return (0, jnp.minimum(i, n_mc_chunks - 1), 0)

    def rb_index(i):
        return (0, jnp.maximum(i - n_mc_chunks, 0), 0)

    ev_idx = (lambda i: (0, 0, 0, 0)) if batched \
        else (lambda i: (0, 0, 0))
    hist_idx = (lambda i: (0, 0, 0, 0)) if batched \
        else (lambda i: (0, 0, 0))

    hist, ev = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((theta_pad.shape[0], npar), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((a2.shape[0], nsignals), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_mc_chunks), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nmask, nsignals), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(hist_shape, hist_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nfields, g_mc, LANES), mc_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nsignals, g_ev, LANES), rb_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(hist_shape, hist_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ev_shape, ev_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(hist_shape, jnp.float32),
            jax.ShapeDtypeStruct(ev_shape, jnp.float32),
        ],
        interpret=interpret,
    )(theta_pad, jnp.asarray(a2, jnp.float32), chunk_seg, mask_matrix,
      hist_init_b, mc_packed, rb_packed)
    return hist, ev


def reduce_pairs(ev_pairs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine per-lane (hi, lo) partials into one compensated pair.

    Same TwoSum monoid as ops.nll.df_sum, seeded with the kernel's
    carried compensations, so the result keeps ~2^-48 relative error
    regardless of the reduction tree XLA picks.
    """
    hi = ev_pairs[..., 0, :, :].reshape(ev_pairs.shape[:-3] + (-1,))
    lo = ev_pairs[..., 1, :, :].reshape(ev_pairs.shape[:-3] + (-1,))
    zero = jnp.zeros((), hi.dtype)

    def monoid(a, b):
        s = a[0] + b[0]
        bv = s - a[0]
        err = (a[0] - (s - bv)) + (b[0] - bv)
        return s, a[1] + b[1] + err

    return jax.lax.reduce((hi, lo), (zero, zero), monoid,
                          (hi.ndim - 1,))


# ---------------------------------------------------------------------------
# jnp reference with the kernel's exact blocking (tests only): interpret
# mode must match this BITWISE; nll_pair must match to compensated
# precision.


def fused_reference_event_pairs(hists_full, norms, w, read_bins,
                                bin_volume, ev_chunk):
    """(hi, lo) event-term pair with the kernel's (chunk, lane)
    accumulation order, in plain jnp."""
    nsig, nev = read_bins.shape
    npad = -(-nev // ev_chunk) * ev_chunk
    rb = jnp.pad(read_bins, ((0, 0), (0, npad - nev)),
                 constant_values=-2)
    g_ev = ev_chunk // LANES
    n_chunks = npad // ev_chunk
    hi_acc = jnp.zeros((g_ev, LANES), jnp.float32)
    lo_acc = jnp.zeros((g_ev, LANES), jnp.float32)
    for ci in range(n_chunks):
        s = None
        for j in range(nsig):
            rbj = rb[j, ci * ev_chunk:(ci + 1) * ev_chunk]
            pos = jnp.maximum(rbj, 0)
            counts = hists_full[j][pos]
            val = counts / (norms[j] * bin_volume)
            val = jnp.where(jnp.isfinite(val), val, 0.0)
            val = jnp.where(rbj < 0, 0.0, val)
            term = w[j] * val
            s = term if s is None else s + term
        logs = jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)), 0.0)
        logsg = logs.reshape(g_ev, LANES)
        s_new = hi_acc + logsg
        bv_ = s_new - hi_acc
        err = (hi_acc - (s_new - bv_)) + (logsg - bv_)
        hi_acc, lo_acc = s_new, lo_acc + err
    pairs = jnp.stack([hi_acc, lo_acc])
    return reduce_pairs(pairs)
