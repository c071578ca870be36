"""Fused MCMC-step kernel: histogram -> LUT -> log-sum -> finished NLL.

The last TPU-native component of SURVEY §2.1's NLL row: one Pallas
launch per Metropolis proposal that replaces the three-launch chain
(pallas_histogram_segmented + pallas_eval_lut + the XLA
mix/log/reduce/finish) and never materializes the
(nsignals, nevents) LUT.  Reference analog being beaten: the fused
``finish_nll_jump_pick_combo`` kernel
(reference: src/nll_kernels.cpp:230-271), which fused only the NLL
*finish* — here the whole PDF rebuild fuses with the event term AND
the finish.

Grid layout (TPU grids run sequentially per core, so a later grid step
sees every earlier step's accumulator writes — the same property the
histogram kernels already rely on):

  step i < n_mc_chunks   (phase A): per-segment histogram accumulate
      into a persistent (nsignals, b1, b2) VMEM block, initialized at
      i == 0 from the precomputed static-signal rows.
  step i >= n_mc_chunks  (phase B): per event chunk, read the
      in-domain norms (unweighted: the finished histogram's block sum
      — integer counts, exact in f32 below 2^24 samples/signal;
      weighted: the compensated phase-A accumulator), form the
      per-signal
      weights from the SMEM parameter row, gather densities via the
      bilinear one-hot (same split as pallas_eval_lut), mix them in
      EXACTLY nll_pair's op order, and accumulate compensated per-lane
      (hi, lo) log-sum pairs.
  step i == grid - 1     (finish): tree-reduce the pair accumulator to
      a scalar pair (TwoSum at every combine), add the expected-count
      term and Gaussian constraints, apply the 1e18 negative-rate /
      non-finite barrier, and write the finished compensated NLL to a
      (nchains, 2) output.  The sampler's XLA side is then only the
      proposal/accept arithmetic.

Exactness contract: the histogram and every per-event density/mix/log
value are bit-identical to the jnp path (verified in interpret mode by
tests/test_fused_step.py; FMA-contraction freedom means ~1-ulp mix
differences between separately compiled programs, bounded by the
compensated pairs).  The reductions group differently from df_sum but
carry TwoSum compensation at every combine, so the finished pair
agrees with nll_pair to ~2^-48 relative — exact at the dNLL ~ 0.5
resolution the Metropolis accept needs.

Weighted MC samples (since r5): the histogram accumulates pallas_hist's
f32 weighted one-hot branch (bin values still bit-identical to the
split path), and the in-domain norms — no longer integer-exact —
accumulate as compensated TwoSum pairs per MC chunk in SMEM scratch,
seeded from host-computed static-row sums.  The fused NLL then agrees
with the split path to ~1 ulp of the norm (the f32 association of
`hists.sum()` vs the chunk-pair sum differs), instead of bit-exactly.

Restrictions (callers fall back to the split path): per-segment packed
stacks only, no KDE rows, no per-event NLL weights (those only occur
in the gradient MLE tier, which uses the differentiable jnp path).
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
_BARRIER = 1e18


def pick_event_chunk(nevents: int, nsignals: int, b1: int, b2: int,
                     nch: int = 1, nexp: int = 1) -> int:
    """Largest 128 * 2^k event chunk whose phase-B working set
    (rb block + f32 one-hot pair + the (b1, chunk) matmul output +
    the per-chain compensated pair scratch) fits the VMEM budget.
    Power-of-two row counts keep the in-kernel pair tree-reduction to
    static halving slices.

    ``nch`` (lock-step chains sharing the launch) and ``nexp``
    (experiment groups, each with its own rb rows) scale the
    chunk-independent scratch — the (nch, nsignals, b1, b2) histogram
    accumulator — and the per-element cost, so large batched launches
    shrink the chunk instead of overflowing the 16 MB scoped VMEM."""
    # Chunk-independent scratch: per-chain histogram accumulator (and
    # its init block), charged against the budget up front.
    fixed = 2 * 4 * nch * nsignals * b1 * max(b2, 128)
    budget = max(_EV_VMEM_BUDGET - fixed, 1 << 20)
    chunk = 65536
    per_el = 4 * (nexp * nsignals + (b1 + b2) + b1 + 2 * nch)
    while chunk > 1024 and chunk * per_el > budget:
        chunk //= 2
    need = 128
    while need < min(nevents, chunk):
        need *= 2
    return min(chunk, need)


def _pair_tree_reduce(hi, lo):
    """(g, 128) compensated pairs -> scalar (hi, lo).

    Halving tree over rows then lanes with a TwoSum at every combine;
    g must be a power of two (pick_event_chunk guarantees it).
    """
    def combine(a_hi, a_lo, b_hi, b_lo):
        s = a_hi + b_hi
        bv = s - a_hi
        err = (a_hi - (s - bv)) + (b_hi - bv)
        return s, a_lo + b_lo + err

    rows = hi.shape[0]
    while rows > 1:
        half = rows // 2
        hi, lo = combine(hi[:half], lo[:half], hi[half:rows],
                         lo[half:rows])
        rows = half
    width = hi.shape[1]
    while width > 1:
        half = width // 2
        hi, lo = combine(hi[:, :half], lo[:, :half], hi[:, half:width],
                         lo[:, half:width])
        width = half
    return hi[0, 0], lo[0, 0]


def _phase_bodies(nfields, nobs, systematics, lower, upper, nbins,
                  b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
                  n_mc, bin_volume, nexpected, source_id, means,
                  sigmas, nsources, has_wrow=False):
    """Shared per-phase compute bodies for the fused kernels.

    Every body takes a scalar-parameter accessor ``par(idx)`` so the
    caller decides where the parameter vector lives: the SMEM input row
    for the one-shot kernel (``pallas_fused_step``), the in-kernel
    proposal scratch for the whole-segment kernel
    (``pallas_fused_segment``).  Keeping the math in one place is what
    makes the two kernels bit-identical per proposal.

    ``has_wrow``: the packed MC block carries a per-sample weight row
    (row ``nfields``); the histogram accumulates f32 one-hots scaled
    by the weights (exactly pallas_hist's weighted branch) and
    ``mc_update`` additionally returns the chunk's in-domain weight
    sum for the caller's compensated norm accumulator — weighted
    norms are NOT integer-exact, so they accumulate as TwoSum pairs
    across chunks instead of re-summing the histogram block.
    """
    strides = hist_ops.bin_strides(nbins)
    scales = tuple(nbins[i] / (upper[i] - lower[i]) for i in range(nobs))
    g_mc = mc_chunk // LANES
    g_ev = ev_chunk // LANES
    npar = len(means)

    def mc_update(sid, mc_ref, mask_ref, par):
        """(nsignals, b1, b2) histogram increment for one MC chunk,
        plus the chunk's in-domain (weighted) sample sum.

        Identical math to pallas_hist._make_per_segment_kernel, with
        chunk_seg carrying GLOBAL signal indices so static rows keep
        their precomputed values untouched.
        """
        seg_iota = jax.lax.broadcasted_iota(
            jnp.int32, (nsignals, b1, 1), 0)
        seg_onehot = (seg_iota == sid).astype(jnp.float32)
        cols = [mc_ref[f] for f in range(nfields)]
        for desc, mrow in systematics:
            on = None if mrow is None else mask_ref[mrow, sid] > 0
            x = cols[desc.obs]
            p = jnp.zeros_like(x)
            xi = jnp.ones_like(x)
            for k, pidx in enumerate(desc.par_indices):
                if k > 0:
                    xi = xi * x
                p = p + par(nsources + pidx) * xi
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
        if has_wrow:
            # f32 one-hots so the per-sample weight keeps full
            # precision through the MXU accumulate (pallas_hist's
            # weighted branch, bit-identical per chunk).
            wrow = mc_ref[nfields]
            onehot_lo = (lo == lo_iota).astype(jnp.float32)
            onehot_hi = (hi == hi_iota).astype(
                jnp.float32) * wrow.reshape(1, mc_chunk)
            cw = jnp.sum(jnp.where(valid, wrow, 0.0))
        else:
            onehot_lo = (lo == lo_iota).astype(jnp.bfloat16)
            onehot_hi = (hi == hi_iota).astype(jnp.bfloat16)
            cw = jnp.sum(valid.astype(jnp.float32))
        part = jax.lax.dot_general(
            onehot_hi, onehot_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return seg_onehot * part[None, :, :], cw

    def norm_of_block(block):
        # In-domain count: total minus the spare trash cell
        # (_balanced_split) — integer-exact in f32 for unweighted
        # counts (the weighted path reads the compensated norm
        # accumulator instead).
        return jnp.sum(block) - block[b1 - 1, b2 - 1]

    def weight_of(norm, par, j):
        # Same association as ops.nll.signal_weights:
        # ((rate * nexpected) * norm) / n_mc.
        rate = par(source_id[j])
        return ((rate * nexpected[j]) * norm) / n_mc[j]

    def ev_onehot(rb_rows):
        """Shared one-hot gather pair for one event chunk.

        Built ONCE from the canonical bin id and shared by every
        signal AND every chain of the experiment the rb rows belong
        to: all signals bin the same observables identically, so
        non-sentinel rows agree on the id and the max over signal rows
        recovers it (sentinels are -1/-2; an all-sentinel event
        gathers bin 0 and is masked to 0 per signal — bit-identical
        output, ~half the per-event VPU work of per-signal one-hots).
        """
        lo_iota = jax.lax.broadcasted_iota(
            jnp.int32, (b2, ev_chunk), 0)
        hi_iota = jax.lax.broadcasted_iota(
            jnp.int32, (b1, ev_chunk), 0)
        rbs = [rb_rows[j].reshape(1, ev_chunk) for j in range(nsignals)]
        canon = rbs[0]
        for j in range(1, nsignals):
            canon = jnp.maximum(canon, rbs[j])
        pos = jnp.maximum(canon, 0)
        olo = (pos & (b2 - 1) == lo_iota).astype(jnp.float32)
        ohi = (pos >> b2_shift == hi_iota).astype(jnp.float32)
        return rbs, olo, ohi

    def ev_logs(oh, hist_get, par, norm_get):
        """(g_ev, LANES) per-event log mixture for one event chunk,
        from an :func:`ev_onehot` gather pair.  ``norm_get(j)`` is the
        in-domain norm accessor (block sum, or the compensated
        weighted accumulator)."""
        rbs, olo, ohi = oh
        s = None
        for j in range(nsignals):
            block = hist_get(j)
            norm = norm_get(j)
            w = weight_of(norm, par, j)
            m = jax.lax.dot_general(
                block, olo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            counts = jnp.sum(ohi * m, axis=0, keepdims=True)
            # pallas_eval_lut's vals, then nll_pair's nan_to_num:
            # sentinels and non-finite -> 0.
            val = counts / (norm * bin_volume)
            val = jnp.where(jnp.isfinite(val), val, 0.0)
            val = jnp.where(rbs[j] < 0, 0.0, val)
            term = w * val
            s = term if s is None else s + term
        logs = jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)), 0.0)
        return logs.reshape(g_ev, LANES)

    def acc_pair(hi_acc, lo_acc, logsg):
        """Branch-free TwoSum accumulate per (row, lane)."""
        s_new = hi_acc + logsg
        bv_ = s_new - hi_acc
        err = (hi_acc - (s_new - bv_)) + (logsg - bv_)
        return s_new, lo_acc + err

    def finish_pair(hist_get, par, e_hi, e_lo, norm_get):
        """Scalar NLL finish: the in-kernel analog of
        ops.nll.finish_nll (w-term, constraints, barrier)."""
        del hist_get  # norms arrive through norm_get
        ev_hi, ev_lo = _pair_tree_reduce(e_hi, e_lo)

        w_hi = jnp.float32(0.0)
        w_lo = jnp.float32(0.0)
        neg_rate = jnp.bool_(False)
        for j in range(nsignals):
            w = weight_of(norm_get(j), par, j)
            sn = w_hi + w
            bv = sn - w_hi
            w_lo = w_lo + ((w_hi - (sn - bv)) + (w - bv))
            w_hi = sn
        con = jnp.float32(0.0)
        for k in range(npar):
            if sigmas[k] > 0:
                z = (par(k) - means[k]) / sigmas[k]
                con = con + 0.5 * (z * z)
        for k in range(nsources):
            neg_rate = neg_rate | (par(k) < 0)

        # df_add(-ev, w) then df_add(con), as in finish_nll.
        h1 = -ev_hi + w_hi
        bv1 = h1 - (-ev_hi)
        l1 = (-ev_lo + w_lo) + ((-ev_hi - (h1 - bv1))
                                + (w_hi - bv1))
        h1b = h1 + l1
        l1b = l1 - (h1b - h1)
        h2 = h1b + con
        bv2 = h2 - h1b
        l2 = l1b + ((h1b - (h2 - bv2)) + (con - bv2))
        h2b = h2 + l2
        l2b = l2 - (h2b - h2)

        bad = neg_rate | ~jnp.isfinite(ev_hi)
        h2b = jnp.where(bad, jnp.float32(_BARRIER), h2b)
        l2b = jnp.where(bad, jnp.float32(0.0), l2b)
        return h2b, l2b

    return (mc_update, ev_onehot, ev_logs, acc_pair, finish_pair,
            norm_of_block)


def _acc_norm_scratch(norm_s, c, sid, cw, nsignals):
    """TwoSum-accumulate a chunk's in-domain weight sum into chain
    ``c``'s per-signal norm pair, routed by the (dynamic) segment id
    through static compares (no dynamic SMEM writes)."""
    for j in range(nsignals):
        cwj = jnp.where(sid == j, cw, jnp.float32(0.0))
        hi0 = norm_s[c, j, 0]
        lo0 = norm_s[c, j, 1]
        sn = hi0 + cwj
        bv = sn - hi0
        err = (hi0 - (sn - bv)) + (cwj - bv)
        norm_s[c, j, 0] = sn
        norm_s[c, j, 1] = lo0 + err


def _make_fused_kernel(nfields, nobs, systematics, lower, upper, nbins,
                       b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
                       n_mc_chunks, grid, n_mc, bin_volume, nchains,
                       nexpected, source_id, means, sigmas, nsources,
                       weighted=False, has_wrow=False):
    batched = nchains is not None
    nch = nchains if batched else 1
    (mc_update, ev_onehot, ev_logs, acc_pair, finish_pair,
     norm_of_block) = _phase_bodies(
        nfields, nobs, systematics, lower, upper, nbins, b1, b2,
        b2_shift, mc_chunk, ev_chunk, nsignals, n_mc, bin_volume,
        nexpected, source_id, means, sigmas, nsources,
        has_wrow=has_wrow)

    def kernel(*refs):
        if weighted:
            (pars_ref, chunk_seg_ref, mask_ref, hist_init_ref,
             norm_init_ref, mc_ref, rb_ref, hist_ref, ev_ref,
             nll_ref, norm_s) = refs
        else:
            (pars_ref, chunk_seg_ref, mask_ref, hist_init_ref,
             mc_ref, rb_ref, hist_ref, ev_ref, nll_ref) = refs
            norm_init_ref = norm_s = None
        i = pl.program_id(0)

        def par_of(c):
            return lambda idx: pars_ref[c, idx]

        def hist_of(c):
            return (lambda j: hist_ref[c, j]) if batched \
                else (lambda j: hist_ref[j])

        def norm_of(c):
            if weighted:
                return lambda j: norm_s[c, j, 0] + norm_s[c, j, 1]
            h = hist_of(c)
            return lambda j: norm_of_block(h(j))

        @pl.when(i == 0)
        def _init():
            hist_ref[:] = hist_init_ref[:]
            ev_ref[:] = jnp.zeros_like(ev_ref)
            if weighted:
                for c in range(nch):
                    for j in range(nsignals):
                        norm_s[c, j, 0] = norm_init_ref[0, j]
                        norm_s[c, j, 1] = jnp.float32(0.0)

        @pl.when(i < n_mc_chunks)
        def _mc_phase():
            sid = chunk_seg_ref[0, i]
            for c in range(nch):
                upd, cw = mc_update(sid, mc_ref, mask_ref, par_of(c))
                if batched:
                    hist_ref[c] += upd
                else:
                    hist_ref[:] += upd
                if weighted:
                    _acc_norm_scratch(norm_s, c, sid, cw, nsignals)

        @pl.when(i >= n_mc_chunks)
        def _ev_phase():
            # One shared gather pair per chunk; chains reuse it.
            oh = ev_onehot([rb_ref[j] for j in range(nsignals)])
            for c in range(nch):
                logsg = ev_logs(oh, hist_of(c), par_of(c), norm_of(c))
                hi_acc = ev_ref[c, 0] if batched else ev_ref[0]
                lo_acc = ev_ref[c, 1] if batched else ev_ref[1]
                s_new, lo_new = acc_pair(hi_acc, lo_acc, logsg)
                if batched:
                    ev_ref[c, 0] = s_new
                    ev_ref[c, 1] = lo_new
                else:
                    ev_ref[0] = s_new
                    ev_ref[1] = lo_new

        @pl.when(i == grid - 1)
        def _finish():
            for c in range(nch):
                e_hi = ev_ref[c, 0] if batched else ev_ref[0]
                e_lo = ev_ref[c, 1] if batched else ev_ref[1]
                h, l = finish_pair(hist_of(c), par_of(c), e_hi, e_lo,
                                   norm_of(c))
                nll_ref[c, 0] = h
                nll_ref[c, 1] = l

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nfields", "nobs", "systematics", "lower", "upper",
                     "nbins", "nsignals", "mc_chunk", "ev_chunk",
                     "n_mc", "bin_volume", "nexpected", "source_id",
                     "means", "sigmas", "nsources", "interpret"))
def pallas_fused_step(
    mc_packed: jnp.ndarray,
    chunk_seg: jnp.ndarray,
    mask_matrix: jnp.ndarray,
    hist_init: jnp.ndarray,
    rb_packed: jnp.ndarray,
    pars: jnp.ndarray,
    norm_init: Optional[jnp.ndarray] = None,
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
    nexpected: Tuple[float, ...],
    source_id: Tuple[int, ...],
    means: Tuple[float, ...],
    sigmas: Tuple[float, ...],
    nsources: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused launch: rebuild + event log-sum + finished NLL.

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
        pars: ``(nparams,)`` or ``(nchains, nparams)`` FULL parameter
            vector (rates then systematic coefficients).
        norm_init: ``(1, nsignals)`` f32 — WEIGHTED stacks only: the
            initial per-signal norms (host-computed weighted sums for
            static rows, 0 for dynamic rows).  Its presence switches
            the kernel to compensated norm accumulation (dynamic norms
            TwoSum per MC chunk instead of the integer-exact block
            sum); the packed block then carries the weight row.
        n_mc / nexpected / source_id / means / sigmas / nsources: the
            NLLStatic constants, as static tuples.

    Returns:
        ``(hist, ev_pairs, nll)``: the ``([nchains,] nsignals, b1,
        b2)`` f32 counts, the ``([nchains,] 2, npad_ev/128, 128)``
        partial pairs (diagnostics/tests), and the finished
        compensated NLL ``([nchains,] 2)`` — ``nll[..., 0] +
        nll[..., 1]`` is the value ``ops.nll.nll_pair`` returns.
    """
    nrows, npad_mc_g, lanes = mc_packed.shape
    weighted = norm_init is not None
    has_wrow = nrows == nfields + 1
    assert lanes == LANES and nrows in (nfields, nfields + 1)
    assert not (has_wrow and not weighted), \
        "a weight row requires norm_init"
    npad_mc = npad_mc_g * LANES
    assert npad_mc % mc_chunk == 0
    n_mc_chunks = npad_mc // mc_chunk

    nsig_rb, npad_ev_g, lanes2 = rb_packed.shape
    assert lanes2 == LANES and nsig_rb == nsignals
    npad_ev = npad_ev_g * LANES
    assert npad_ev % ev_chunk == 0
    n_ev_chunks = npad_ev // ev_chunk
    g_ev = ev_chunk // LANES
    assert g_ev & (g_ev - 1) == 0, "ev_chunk must be 128 * 2^k"

    total = hist_ops.total_bins(nbins)
    b1, b2, b2_shift = _balanced_split(total)
    assert hist_init.shape[-3:] == (nsignals, b1, b2)

    batched = pars.ndim == 2
    nchains = pars.shape[0] if batched else None
    pars2 = pars if batched else pars[None, :]
    npar = pars2.shape[1]
    assert npar == len(means) == len(sigmas)

    grid = n_mc_chunks + n_ev_chunks
    kernel = _make_fused_kernel(
        nfields, nobs, tuple(systematics), tuple(lower), tuple(upper),
        tuple(nbins), b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
        n_mc_chunks, grid, tuple(n_mc), bin_volume, nchains,
        tuple(nexpected), tuple(source_id), tuple(means), tuple(sigmas),
        nsources, weighted=weighted, has_wrow=has_wrow)

    g_mc = mc_chunk // LANES
    nmask = mask_matrix.shape[0]

    hist_shape = ((nchains, nsignals, b1, b2) if batched
                  else (nsignals, b1, b2))
    # Event pairs accumulate ACROSS event chunks into one persistent
    # block (constant index map), exactly like the histogram
    # accumulator — per-chunk output blocks would arrive uninitialized.
    ev_shape = ((nchains, 2, g_ev, LANES) if batched
                else (2, g_ev, LANES))
    nll_shape = (nchains if batched else 1, 2)
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

    in_specs = [
        pl.BlockSpec((pars2.shape[0], npar), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n_mc_chunks), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((nmask, nsignals), lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(hist_shape, hist_idx,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nrows, g_mc, LANES), mc_index,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nsignals, g_ev, LANES), rb_index,
                     memory_space=pltpu.VMEM),
    ]
    operands = [jnp.asarray(pars2, jnp.float32), chunk_seg,
                mask_matrix, hist_init_b, mc_packed, rb_packed]
    scratch = []
    if weighted:
        in_specs.insert(4, pl.BlockSpec((1, nsignals),
                                        lambda i: (0, 0),
                                        memory_space=pltpu.SMEM))
        operands.insert(4, jnp.asarray(norm_init, jnp.float32
                                       ).reshape(1, nsignals))
        nch_s = nchains if batched else 1
        scratch.append(pltpu.SMEM((nch_s, nsignals, 2), jnp.float32))

    hist, ev, nll_out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(hist_shape, hist_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ev_shape, ev_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nll_shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(hist_shape, jnp.float32),
            jax.ShapeDtypeStruct(ev_shape, jnp.float32),
            jax.ShapeDtypeStruct(nll_shape, jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    if not batched:
        nll_out = nll_out[0]
    return hist, ev, nll_out


def _make_segment_kernel(nfields, nobs, systematics, lower, upper,
                         nbins, b1, b2, b2_shift, mc_chunk, ev_chunk,
                         nsignals, n_mc_chunks, n_phases, n_mc,
                         bin_volume, nexpected, source_id, means,
                         sigmas, nsources, debug_mode, use_tril, nch,
                         nexp, weighted=False, has_wrow=False,
                         tempered=False):
    """Whole-segment kernel body; ``nch`` lock-step chains share every
    MC/rb block fetch (the single-chain case is ``nch == 1``).

    ``nexp`` is None for the shared-dataset form (one rb block for all
    chains) or an int for the experiment-grouped form (the sharded
    ensemble, SURVEY §2.2): rb arrives ``(nexp, nsignals, ...)`` and
    chain ``c`` evaluates against experiment ``c // (nch // nexp)``'s
    rb rows — the chains of one experiment share one gather-pair build
    per event chunk, and every experiment shares the single MC fetch.

    The tril proposal branch carries a per-chain lower-triangular
    ``(nch, npar, npar)`` scale in SMEM (batched full-covariance
    chains use the kernel's native form, never the generic vmap rule).
    """
    npar = len(means)
    (mc_update, ev_onehot, ev_logs, acc_pair, finish_pair,
     norm_of_block) = _phase_bodies(
        nfields, nobs, systematics, lower, upper, nbins, b1, b2,
        b2_shift, mc_chunk, ev_chunk, nsignals, n_mc, bin_volume,
        nexpected, source_id, means, sigmas, nsources,
        has_wrow=has_wrow)
    cpe = nch // nexp if nexp else nch

    def kernel(*refs):
        refs = list(refs)
        chunk_seg_ref = refs.pop(0)
        mask_ref = refs.pop(0)
        hist_init_ref = refs.pop(0)
        norm_init_ref = refs.pop(0) if weighted else None
        params0_ref = refs.pop(0)
        nll0_ref = refs.pop(0)
        width_ref = refs.pop(0)
        beta_ref = refs.pop(0) if tempered else None
        noise_ref = refs.pop(0)
        logu_ref = refs.pop(0)
        mc_ref = refs.pop(0)
        rb_ref = refs.pop(0)
        samples_ref = refs.pop(0)
        nlls_ref = refs.pop(0)
        acc_ref = refs.pop(0)
        hist_s = refs.pop(0)
        ev_s = refs.pop(0)
        cur_s = refs.pop(0)
        prop_s = refs.pop(0)
        curnll_s = refs.pop(0)
        norm_s = refs.pop(0) if weighted else None
        s = pl.program_id(0)
        i = pl.program_id(1)

        def par_of(c):
            return lambda idx: prop_s[c, idx]

        def hist_of(c):
            return lambda j: hist_s[c, j]

        def norm_of(c):
            if weighted:
                return lambda j: norm_s[c, j, 0] + norm_s[c, j, 1]
            h = hist_of(c)
            return lambda j: norm_of_block(h(j))

        @pl.when(i == 0)
        def _propose():
            @pl.when(s == 0)
            def _first():
                for c in range(nch):
                    for k in range(npar):
                        cur_s[c, k] = params0_ref[c, k]
                    curnll_s[c, 0] = nll0_ref[c, 0]
                    curnll_s[c, 1] = nll0_ref[c, 1]

            hist_s[:] = jnp.broadcast_to(hist_init_ref[:],
                                         hist_s.shape)
            ev_s[:] = jnp.zeros_like(ev_s)
            if weighted:
                for c in range(nch):
                    for j in range(nsignals):
                        norm_s[c, j, 0] = norm_init_ref[0, j]
                        norm_s[c, j, 1] = jnp.float32(0.0)
            for c in range(nch):
                if use_tril:
                    # Full-covariance proposal: prop = cur + L @ z
                    # with L lower-triangular, PER CHAIN
                    # (metropolis._make_step_cov); zero rows pin fixed
                    # parameters exactly.
                    for k in range(npar):
                        acc = jnp.float32(0.0)
                        for j in range(k + 1):
                            acc = acc + (width_ref[c, k, j]
                                         * noise_ref[0, c, j])
                        prop_s[c, k] = cur_s[c, k] + acc
                else:
                    # Diagonal proposal: same op order as
                    # metropolis._make_step (noise * max(width, 0);
                    # fixed params, width <= 0, pinned).
                    for k in range(npar):
                        w = width_ref[c, k]
                        nz = noise_ref[0, c, k] * jnp.maximum(w, 0.0)
                        prop_s[c, k] = jnp.where(w > 0,
                                                 cur_s[c, k] + nz,
                                                 cur_s[c, k])

        @pl.when(i < n_mc_chunks)
        def _mc_phase():
            sid = chunk_seg_ref[0, i]
            for c in range(nch):
                upd, cw = mc_update(sid, mc_ref, mask_ref, par_of(c))
                hist_s[c] += upd
                if weighted:
                    _acc_norm_scratch(norm_s, c, sid, cw, nsignals)

        @pl.when(i >= n_mc_chunks)
        def _ev_phase():
            # One shared gather pair per (experiment, chunk); the
            # experiment's chains reuse it.
            for e in range(nexp or 1):
                rows = ([rb_ref[e, j] for j in range(nsignals)]
                        if nexp else
                        [rb_ref[j] for j in range(nsignals)])
                oh = ev_onehot(rows)
                for cc in range(cpe):
                    c = e * cpe + cc
                    logsg = ev_logs(oh, hist_of(c), par_of(c),
                                    norm_of(c))
                    s_new, lo_new = acc_pair(ev_s[c, 0], ev_s[c, 1],
                                             logsg)
                    ev_s[c, 0] = s_new
                    ev_s[c, 1] = lo_new

        @pl.when(i == n_phases - 1)
        def _accept():
            for c in range(nch):
                prop_hi, prop_lo = finish_pair(hist_of(c), par_of(c),
                                               ev_s[c, 0], ev_s[c, 1],
                                               norm_of(c))
                cur_hi = curnll_s[c, 0]
                cur_lo = curnll_s[c, 1]
                if debug_mode:
                    # Accept-all (debug chains), unconditionally.
                    for k in range(npar):
                        cur_s[c, k] = prop_s[c, k]
                    curnll_s[c, 0] = prop_hi
                    curnll_s[c, 1] = prop_lo
                    acc_ref[0, 0, c] = jnp.float32(1.0)
                else:
                    # ops.nll.df_diff's exact op order, then the
                    # log-space Metropolis rule: u <= exp(delta)
                    # becomes log(u) <= delta (log_u precomputed on
                    # the XLA side so the kernel needs no
                    # transcendental and stays bit-reproducible
                    # across backends).  Tempered replicas anneal the
                    # accept by their inverse temperature (beta > 0
                    # preserves the sign, so the fast-accept branch
                    # is unchanged).
                    delta = (cur_hi - prop_hi) + (cur_lo - prop_lo)
                    if tempered:
                        delta = beta_ref[0, c] * delta
                    acc = (delta > 0) | (logu_ref[0, 0, c] <= delta)
                    for k in range(npar):
                        cur_s[c, k] = jnp.where(acc, prop_s[c, k],
                                                cur_s[c, k])
                    curnll_s[c, 0] = jnp.where(acc, prop_hi, cur_hi)
                    curnll_s[c, 1] = jnp.where(acc, prop_lo, cur_lo)
                    acc_ref[0, 0, c] = jnp.where(acc, jnp.float32(1.0),
                                                 jnp.float32(0.0))
                for k in range(npar):
                    samples_ref[0, c, k] = cur_s[c, k]
                nlls_ref[0, c, 0] = curnll_s[c, 0]
                nlls_ref[0, c, 1] = curnll_s[c, 1]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("nfields", "nobs", "systematics", "lower", "upper",
                     "nbins", "nsignals", "mc_chunk", "ev_chunk",
                     "n_mc", "bin_volume", "nexpected", "source_id",
                     "means", "sigmas", "nsources", "nsteps",
                     "debug_mode", "interpret"))
def pallas_fused_segment(
    mc_packed: jnp.ndarray,
    chunk_seg: jnp.ndarray,
    mask_matrix: jnp.ndarray,
    hist_init: jnp.ndarray,
    rb_packed: jnp.ndarray,
    params0: jnp.ndarray,
    nll0: jnp.ndarray,
    width: jnp.ndarray,
    noise: jnp.ndarray,
    log_u: jnp.ndarray,
    norm_init: Optional[jnp.ndarray] = None,
    beta: Optional[jnp.ndarray] = None,
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
    nexpected: Tuple[float, ...],
    source_id: Tuple[int, ...],
    means: Tuple[float, ...],
    sigmas: Tuple[float, ...],
    nsources: int,
    nsteps: int,
    debug_mode: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """A WHOLE Metropolis segment in one Pallas launch.

    Grid ``(nsteps, n_mc_chunks + n_ev_chunks)``: for each step the
    kernel proposes in-kernel from presampled ``noise`` (phase 0),
    rebuilds the dynamic histograms for the proposal (MC phases),
    accumulates the compensated event log-sum (event phases), finishes
    the NLL and applies the Metropolis accept against presampled
    ``log_u`` (final phase), carrying (params, NLL pair) in SMEM
    scratch across grid steps.  This removes the per-step XLA
    scan/dispatch glue entirely — per-step cost is pure kernel time
    (the measured ~11 us/step of non-kernel overhead in the one-launch-
    per-step path goes away).

    The accept rule is the measure-equivalent log form
    ``log(u) <= delta`` (u-space in the scan path: ``u <= exp(delta)``)
    so the kernel needs no transcendental; trajectories can differ
    from the scan path only when u lies within rounding error of
    exp(delta).  The per-proposal NLL math is shared code with
    ``pallas_fused_step`` (see ``_phase_bodies``) and therefore
    bit-identical to it.

    Args (beyond ``pallas_fused_step``):
        params0: ``(npar,)`` f32 initial parameters.
        nll0: ``(2,)`` f32 initial compensated NLL pair.
        width: ``(npar,)`` f32 jump widths (<= 0 pins a parameter),
            or an ``(npar, npar)`` lower-triangular ``scale_tril`` for
            full-covariance proposals ``cur + L @ z`` (zero rows pin);
            batched chains pass ``(nchains, npar)`` widths or
            ``(nchains, npar, npar)`` per-chain trils.
        noise: ``(nsteps, npar)`` f32 presampled N(0, 1) proposals.
        log_u: ``(nsteps,)`` f32 presampled log accept uniforms.
        norm_init: ``(1, nsignals)`` f32 — WEIGHTED stacks only (see
            ``pallas_fused_step``): switches to compensated norm
            accumulation, reset per step at the propose phase.
        beta: optional ``(nchains,)`` f32 inverse temperatures —
            tempered-replica ladders anneal each chain's accept as
            ``log(u) <= beta_c * delta`` (parallel tempering; the
            1/sqrt(beta) proposal widening folds into the per-chain
            ``width`` rows outside).

    Batched lock-step chains: pass ``params0`` as ``(nchains, npar)``
    (with ``nll0`` ``(nchains, 2)``, ``width`` ``(nchains, npar)``,
    ``noise`` ``(nsteps, nchains, npar)``, ``log_u``
    ``(nsteps, nchains)``) and every chain advances per grid step with
    ONE shared fetch of each MC/rb block — the whole multi-chain
    segment is still a single launch.

    Experiment-grouped chains (the sharded-ensemble shard body): pass
    ``rb_packed`` as ``(nexp, nsignals, npad_ev/128, 128)`` with the
    batched ``params0 (nchains, npar)`` where ``nchains`` is
    ``nexp * chains_per_exp`` and chain ``c`` belongs to experiment
    ``c // chains_per_exp``.  Each experiment's chains share one
    gather-pair build per event chunk; per-chain trajectories are
    bit-identical to the shared-dataset form run with that
    experiment's rb.

    Returns:
        ``(samples, nlls, accepts)``: post-accept parameter history
        ``(nsteps, npar)``, compensated NLL history ``(nsteps, 2)``,
        accept flags ``(nsteps, 1)`` — exactly the scan history of
        ``metropolis.run_segment``.  Batched: ``(nsteps, nchains,
        npar)`` / ``(nsteps, nchains, 2)`` / ``(nsteps, nchains)``.
    """
    nrows, npad_mc_g, lanes = mc_packed.shape
    weighted = norm_init is not None
    has_wrow = nrows == nfields + 1
    assert lanes == LANES and nrows in (nfields, nfields + 1)
    assert not (has_wrow and not weighted), \
        "a weight row requires norm_init"
    npad_mc = npad_mc_g * LANES
    assert npad_mc % mc_chunk == 0
    n_mc_chunks = npad_mc // mc_chunk

    grouped = rb_packed.ndim == 4
    if grouped:
        nexp, nsig_rb, npad_ev_g, lanes2 = rb_packed.shape
    else:
        nexp = None
        nsig_rb, npad_ev_g, lanes2 = rb_packed.shape
    assert lanes2 == LANES and nsig_rb == nsignals
    npad_ev = npad_ev_g * LANES
    assert npad_ev % ev_chunk == 0
    n_ev_chunks = npad_ev // ev_chunk
    g_ev = ev_chunk // LANES
    assert g_ev & (g_ev - 1) == 0, "ev_chunk must be 128 * 2^k"

    total = hist_ops.total_bins(nbins)
    b1, b2, b2_shift = _balanced_split(total)
    assert hist_init.shape == (nsignals, b1, b2)
    batched = params0.ndim == 2
    nch = params0.shape[0] if batched else 1
    assert not grouped or (batched and nch % nexp == 0)
    npar = params0.shape[-1]
    assert npar == len(means) == len(sigmas)
    p0_in = jnp.asarray(params0, jnp.float32).reshape(nch, npar)
    nll0_in = jnp.asarray(nll0, jnp.float32).reshape(nch, 2)
    noise_in = jnp.asarray(noise, jnp.float32).reshape(
        nsteps, nch, npar)
    logu_in = jnp.asarray(log_u, jnp.float32).reshape(nsteps, 1, nch)

    use_tril = (width.ndim == 3 and width.shape[-2:] == (npar, npar)) \
        or (width.ndim == 2 and width.shape == (npar, npar)
            and not batched)
    if use_tril:
        width_in = jnp.asarray(width, jnp.float32).reshape(
            nch, npar, npar)
        width_spec = pl.BlockSpec((nch, npar, npar),
                                  lambda s, i: (0, 0, 0),
                                  memory_space=pltpu.SMEM)
    else:
        width_in = jnp.asarray(width, jnp.float32).reshape(nch, npar)
        width_spec = pl.BlockSpec((nch, npar), lambda s, i: (0, 0),
                                  memory_space=pltpu.SMEM)

    n_phases = n_mc_chunks + n_ev_chunks
    kernel = _make_segment_kernel(
        nfields, nobs, tuple(systematics), tuple(lower), tuple(upper),
        tuple(nbins), b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
        n_mc_chunks, n_phases, tuple(n_mc), bin_volume,
        tuple(nexpected), tuple(source_id), tuple(means), tuple(sigmas),
        nsources, debug_mode, use_tril, nch, nexp,
        weighted=weighted, has_wrow=has_wrow,
        tempered=beta is not None)

    g_mc = mc_chunk // LANES
    nmask = mask_matrix.shape[0]

    def mc_index(s, i):
        return (0, jnp.minimum(i, n_mc_chunks - 1), 0)

    if grouped:
        def rb_index(s, i):
            return (0, 0, jnp.maximum(i - n_mc_chunks, 0), 0)

        rb_spec = pl.BlockSpec((nexp, nsignals, g_ev, LANES), rb_index,
                               memory_space=pltpu.VMEM)
    else:
        def rb_index(s, i):
            return (0, jnp.maximum(i - n_mc_chunks, 0), 0)

        rb_spec = pl.BlockSpec((nsignals, g_ev, LANES), rb_index,
                               memory_space=pltpu.VMEM)

    # Per-step arrays are (nsteps, A, B) with (1, A, B) blocks: the
    # Mosaic block rule constrains the LAST TWO dims (divisible by
    # (8, 128) or equal to the array dims); a leading step dim is free.
    def step_row(s, i):
        return (s, 0, 0)

    in_specs = [
        pl.BlockSpec((1, n_mc_chunks), lambda s, i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((nmask, nsignals), lambda s, i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((nsignals, b1, b2), lambda s, i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nch, npar), lambda s, i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((nch, 2), lambda s, i: (0, 0),
                     memory_space=pltpu.SMEM),
        width_spec,
        pl.BlockSpec((1, nch, npar), step_row,
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, nch), step_row,
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((nrows, g_mc, LANES), mc_index,
                     memory_space=pltpu.VMEM),
        rb_spec,
    ]
    operands = [chunk_seg, mask_matrix,
                jnp.asarray(hist_init, jnp.float32), p0_in, nll0_in,
                width_in, noise_in, logu_in, mc_packed, rb_packed]
    scratch = [
        pltpu.VMEM((nch, nsignals, b1, b2), jnp.float32),
        pltpu.VMEM((nch, 2, g_ev, LANES), jnp.float32),
        pltpu.SMEM((nch, npar), jnp.float32),
        pltpu.SMEM((nch, npar), jnp.float32),
        pltpu.SMEM((nch, 2), jnp.float32),
    ]
    if beta is not None:
        wi = in_specs.index(width_spec)
        in_specs.insert(wi + 1, pl.BlockSpec((1, nch),
                                             lambda s, i: (0, 0),
                                             memory_space=pltpu.SMEM))
        operands.insert(wi + 1, jnp.asarray(beta, jnp.float32
                                            ).reshape(1, nch))
    if weighted:
        in_specs.insert(3, pl.BlockSpec((1, nsignals),
                                        lambda s, i: (0, 0),
                                        memory_space=pltpu.SMEM))
        operands.insert(3, jnp.asarray(norm_init, jnp.float32
                                       ).reshape(1, nsignals))
        scratch.append(pltpu.SMEM((nch, nsignals, 2), jnp.float32))

    samples, nlls, accepts = pl.pallas_call(
        kernel,
        grid=(nsteps, n_phases),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, nch, npar), step_row,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nch, 2), step_row,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nch), step_row,
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps, nch, npar), jnp.float32),
            jax.ShapeDtypeStruct((nsteps, nch, 2), jnp.float32),
            jax.ShapeDtypeStruct((nsteps, 1, nch), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    if batched:
        return samples, nlls, accepts[:, 0, :]
    return (samples.reshape(nsteps, npar), nlls.reshape(nsteps, 2),
            accepts.reshape(nsteps, 1))


def _make_blocked_segment_kernel(nfields, nobs, systematics, lower,
                                 upper, nbins, b1, b2, b2_shift,
                                 mc_chunk, ev_chunk, nsignals,
                                 n_mc_chunks, n_ev_chunks, nsub, n_mc,
                                 bin_volume, nexpected, source_id,
                                 means, sigmas, nsources, debug_mode,
                                 nch, nexp, nsources_sel):
    """Whole-segment kernel with BLOCKED Metropolis-within-Gibbs
    cycles run entirely in-kernel (the r5 extension of the joint
    segment kernel).

    Per recorded cycle (grid step s): one systematic-block proposal
    whose histogram rebuild runs the MC phases, then ``nsub - 1``
    rate-block proposals that REUSE the carried current histogram —
    each decision needs only an event-phase sweep.  Two persistent
    histogram scratches carry state: ``hist_cur`` (the accepted
    state's histogram, carried ACROSS cycles) and ``hist_prop`` (the
    systematic proposal, rebuilt each cycle); a systematic accept
    copies prop -> cur in VMEM (a few hundred KB, vs a full rebuild).
    The scan analog is metropolis._make_blocked_step, whose (lut,
    norms) carry this replaces; proposal masks and presampled RNG
    streams match it exactly, with the accept in the kernel's
    measure-equivalent log form.
    """
    npar = len(means)
    (mc_update, ev_onehot, ev_logs, acc_pair, finish_pair,
     norm_of_block) = _phase_bodies(
        nfields, nobs, systematics, lower, upper, nbins, b1, b2,
        b2_shift, mc_chunk, ev_chunk, nsignals, n_mc, bin_volume,
        nexpected, source_id, means, sigmas, nsources)
    cpe = nch // nexp if nexp else nch
    n_phases = n_mc_chunks + nsub * n_ev_chunks

    def kernel(chunk_seg_ref, mask_ref, hist_init_ref, hist_cur0_ref,
               params0_ref, nll0_ref, width_ref, noise_ref, logu_ref,
               mc_ref, rb_ref, samples_ref, nlls_ref, acc_ref,
               hist_cur, hist_prop, ev_s, cur_s, prop_s, curnll_s,
               accn_s):
        s = pl.program_id(0)
        i = pl.program_id(1)

        def par_of(c):
            return lambda idx: prop_s[c, idx]

        def hist_prop_of(c):
            return lambda j: hist_prop[c, j]

        def hist_cur_of(c):
            return lambda j: hist_cur[c, j]

        def norm_from(hist_get):
            return lambda j: norm_of_block(hist_get(j))

        def propose(c, sub, rate_block):
            # Block proposal masks match _make_blocked_step: the
            # systematic block moves everything EXCEPT rates; rate
            # blocks move only rates; width <= 0 pins either way.
            # Block membership is static per coordinate, so unmoved
            # entries are plain copies of the current state.
            for k in range(npar):
                is_rate = k < nsources_sel
                if rate_block == is_rate:
                    w = width_ref[c, k]
                    nz = noise_ref[0, sub, c, k] * jnp.maximum(w, 0.0)
                    prop_s[c, k] = jnp.where(w > 0, cur_s[c, k] + nz,
                                             cur_s[c, k])
                else:
                    prop_s[c, k] = cur_s[c, k]

        @pl.when(i == 0)
        def _cycle_start():
            @pl.when(s == 0)
            def _first():
                for c in range(nch):
                    for k in range(npar):
                        cur_s[c, k] = params0_ref[c, k]
                    curnll_s[c, 0] = nll0_ref[c, 0]
                    curnll_s[c, 1] = nll0_ref[c, 1]
                hist_cur[:] = hist_cur0_ref[:]

            hist_prop[:] = jnp.broadcast_to(hist_init_ref[:],
                                            hist_prop.shape)
            ev_s[:] = jnp.zeros_like(ev_s)
            for c in range(nch):
                accn_s[c] = jnp.float32(0.0)
                propose(c, 0, rate_block=False)

        @pl.when(i < n_mc_chunks)
        def _mc_phase():
            sid = chunk_seg_ref[0, i]
            for c in range(nch):
                upd, _ = mc_update(sid, mc_ref, mask_ref, par_of(c))
                hist_prop[c] += upd

        in_ev = i >= n_mc_chunks
        sub = (i - n_mc_chunks) // n_ev_chunks
        sweep_end = in_ev & (
            (i - n_mc_chunks) % n_ev_chunks == n_ev_chunks - 1)

        def _ev_sweep(hist_of):
            for e in range(nexp or 1):
                rows = ([rb_ref[e, j] for j in range(nsignals)]
                        if nexp else
                        [rb_ref[j] for j in range(nsignals)])
                oh = ev_onehot(rows)
                for cc in range(cpe):
                    c = e * cpe + cc
                    logsg = ev_logs(oh, hist_of(c), par_of(c),
                                    norm_from(hist_of(c)))
                    s_new, lo_new = acc_pair(ev_s[c, 0], ev_s[c, 1],
                                             logsg)
                    ev_s[c, 0] = s_new
                    ev_s[c, 1] = lo_new

        @pl.when(in_ev & (sub == 0))
        def _ev_phase_syst():
            _ev_sweep(hist_prop_of)

        @pl.when(in_ev & (sub > 0))
        def _ev_phase_rate():
            _ev_sweep(hist_cur_of)

        def _decide(c, hist_of, sub_, copy_hist):
            prop_hi, prop_lo = finish_pair(
                hist_of(c), par_of(c), ev_s[c, 0], ev_s[c, 1],
                norm_from(hist_of(c)))
            cur_hi = curnll_s[c, 0]
            cur_lo = curnll_s[c, 1]
            if debug_mode:
                acc = jnp.bool_(True)
            else:
                delta = (cur_hi - prop_hi) + (cur_lo - prop_lo)
                acc = (delta > 0) | (logu_ref[0, sub_, c] <= delta)
            for k in range(npar):
                cur_s[c, k] = jnp.where(acc, prop_s[c, k], cur_s[c, k])
            curnll_s[c, 0] = jnp.where(acc, prop_hi, cur_hi)
            curnll_s[c, 1] = jnp.where(acc, prop_lo, cur_lo)
            accn_s[c] = accn_s[c] + jnp.where(acc, jnp.float32(1.0),
                                              jnp.float32(0.0))
            if copy_hist:
                hist_cur[c] = jnp.where(acc, hist_prop[c], hist_cur[c])

        # Sweep-end decisions: the systematic block (sub == 0) may
        # copy prop -> cur; rate blocks never touch the histogram.
        # Each pl.when body instantiates its sub index STATICALLY via
        # the per-sub guard so logu/noise rows index statically.
        for sub_k in range(nsub):
            is_last = sub_k == nsub - 1

            @pl.when(sweep_end & (sub == sub_k))
            def _decide_sub(sub_k=sub_k, is_last=is_last):
                for c in range(nch):
                    _decide(c, hist_prop_of if sub_k == 0
                            else hist_cur_of, sub_k,
                            copy_hist=(sub_k == 0))
                    if is_last:
                        for k in range(npar):
                            samples_ref[0, c, k] = cur_s[c, k]
                        nlls_ref[0, c, 0] = curnll_s[c, 0]
                        nlls_ref[0, c, 1] = curnll_s[c, 1]
                        acc_ref[0, 0, c] = accn_s[c] / jnp.float32(
                            nsub)
                if not is_last:
                    ev_s[:] = jnp.zeros_like(ev_s)
                    for c in range(nch):
                        propose(c, sub_k + 1, rate_block=True)

    return kernel, n_phases


@functools.partial(
    jax.jit,
    static_argnames=("nfields", "nobs", "systematics", "lower", "upper",
                     "nbins", "nsignals", "mc_chunk", "ev_chunk",
                     "n_mc", "bin_volume", "nexpected", "source_id",
                     "means", "sigmas", "nsources", "nsteps",
                     "rate_substeps", "debug_mode", "interpret"))
def pallas_fused_segment_blocked(
    mc_packed: jnp.ndarray,
    chunk_seg: jnp.ndarray,
    mask_matrix: jnp.ndarray,
    hist_init: jnp.ndarray,
    hist_cur0: jnp.ndarray,
    rb_packed: jnp.ndarray,
    params0: jnp.ndarray,
    nll0: jnp.ndarray,
    width: jnp.ndarray,
    noise: jnp.ndarray,
    log_u: jnp.ndarray,
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
    nexpected: Tuple[float, ...],
    source_id: Tuple[int, ...],
    means: Tuple[float, ...],
    sigmas: Tuple[float, ...],
    nsources: int,
    nsteps: int,
    rate_substeps: int,
    debug_mode: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blocked Metropolis-within-Gibbs segment in ONE Pallas launch.

    Grid ``(nsteps, n_mc_chunks + (M+1) * n_ev_chunks)``: per cycle,
    a systematic-block proposal rebuilds the dynamic histograms (MC
    phases) and is decided after the first event sweep; then M
    rate-block proposals each cost ONE event sweep against the
    carried current histogram — no rebuild, no per-substep XLA
    dispatch (the scan path pays a launch + ~13 us per rate move).

    Args (beyond ``pallas_fused_segment``):
        hist_cur0: ``([nch,] nsignals, b1, b2)`` f32 — the CURRENT
            state's full histogram at ``params0`` (e.g. the hist
            output of ``pallas_fused_step`` at the segment-start
            parameters).
        noise: ``(nsteps, M+1, npar)`` (or ``(nsteps, M+1, nch,
            npar)`` batched) presampled N(0,1), row 0 the systematic
            block then the M rate blocks — metropolis._presample's
            layout.
        log_u: ``(nsteps, M+1[, nch])`` presampled log accept
            uniforms.

    Restrictions: diagonal widths only (no tril), unweighted stacks
    (the blocked rate sweep reuses block-sum norms).  Returns the
    scan-shaped ``(samples, nlls, accepts)`` histories; ``accepts``
    is the per-cycle accepted fraction over the M+1 decisions.
    """
    nsub = rate_substeps + 1
    nrows, npad_mc_g, lanes = mc_packed.shape
    assert lanes == LANES and nrows == nfields, \
        "blocked fused segment: unweighted stacks only"
    npad_mc = npad_mc_g * LANES
    assert npad_mc % mc_chunk == 0
    n_mc_chunks = npad_mc // mc_chunk

    grouped = rb_packed.ndim == 4
    if grouped:
        nexp, nsig_rb, npad_ev_g, lanes2 = rb_packed.shape
    else:
        nexp = None
        nsig_rb, npad_ev_g, lanes2 = rb_packed.shape
    assert lanes2 == LANES and nsig_rb == nsignals
    npad_ev = npad_ev_g * LANES
    assert npad_ev % ev_chunk == 0
    n_ev_chunks = npad_ev // ev_chunk
    g_ev = ev_chunk // LANES
    assert g_ev & (g_ev - 1) == 0, "ev_chunk must be 128 * 2^k"

    total = hist_ops.total_bins(nbins)
    b1, b2, b2_shift = _balanced_split(total)
    assert hist_init.shape == (nsignals, b1, b2)
    batched = params0.ndim == 2
    nch = params0.shape[0] if batched else 1
    assert not grouped or (batched and nch % nexp == 0)
    npar = params0.shape[-1]
    assert npar == len(means) == len(sigmas)
    p0_in = jnp.asarray(params0, jnp.float32).reshape(nch, npar)
    nll0_in = jnp.asarray(nll0, jnp.float32).reshape(nch, 2)
    width_in = jnp.asarray(width, jnp.float32).reshape(nch, npar)
    noise_in = jnp.asarray(noise, jnp.float32).reshape(
        nsteps, nsub, nch, npar)
    logu_in = jnp.asarray(log_u, jnp.float32).reshape(
        nsteps, nsub, nch)
    hist_cur0_in = jnp.broadcast_to(
        jnp.asarray(hist_cur0, jnp.float32).reshape(
            -1, nsignals, b1, b2),
        (nch, nsignals, b1, b2))

    kernel, n_phases = _make_blocked_segment_kernel(
        nfields, nobs, tuple(systematics), tuple(lower), tuple(upper),
        tuple(nbins), b1, b2, b2_shift, mc_chunk, ev_chunk, nsignals,
        n_mc_chunks, n_ev_chunks, nsub, tuple(n_mc), bin_volume,
        tuple(nexpected), tuple(source_id), tuple(means),
        tuple(sigmas), nsources, debug_mode, nch, nexp, nsources)

    g_mc = mc_chunk // LANES
    nmask = mask_matrix.shape[0]

    def mc_index(s, i):
        return (0, jnp.minimum(i, n_mc_chunks - 1), 0)

    def rb_block(s, i):
        return jax.lax.rem(jnp.maximum(i - n_mc_chunks, 0),
                           n_ev_chunks)

    if grouped:
        rb_spec = pl.BlockSpec(
            (nexp, nsignals, g_ev, LANES),
            lambda s, i: (0, 0, rb_block(s, i), 0),
            memory_space=pltpu.VMEM)
    else:
        rb_spec = pl.BlockSpec(
            (nsignals, g_ev, LANES),
            lambda s, i: (0, rb_block(s, i), 0),
            memory_space=pltpu.VMEM)

    def step_row(s, i):
        return (s, 0, 0)

    samples, nlls, accepts = pl.pallas_call(
        kernel,
        grid=(nsteps, n_phases),
        in_specs=[
            pl.BlockSpec((1, n_mc_chunks), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nmask, nsignals), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nsignals, b1, b2), lambda s, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, nsignals, b1, b2),
                         lambda s, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, npar), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nch, 2), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nch, npar), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, nch, npar), lambda s, i: (s, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nsub, nch), lambda s, i: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nfields, g_mc, LANES), mc_index,
                         memory_space=pltpu.VMEM),
            rb_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, nch, npar), step_row,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nch, 2), step_row,
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, nch), step_row,
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsteps, nch, npar), jnp.float32),
            jax.ShapeDtypeStruct((nsteps, nch, 2), jnp.float32),
            jax.ShapeDtypeStruct((nsteps, 1, nch), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nch, nsignals, b1, b2), jnp.float32),
            pltpu.VMEM((nch, nsignals, b1, b2), jnp.float32),
            pltpu.VMEM((nch, 2, g_ev, LANES), jnp.float32),
            pltpu.SMEM((nch, npar), jnp.float32),
            pltpu.SMEM((nch, npar), jnp.float32),
            pltpu.SMEM((nch, 2), jnp.float32),
            pltpu.SMEM((nch,), jnp.float32),
        ],
        interpret=interpret,
    )(chunk_seg, mask_matrix, jnp.asarray(hist_init, jnp.float32),
      hist_cur0_in, p0_in, nll0_in, width_in, noise_in, logu_in,
      mc_packed, rb_packed)
    if batched:
        return samples, nlls, accepts[:, 0, :]
    return (samples.reshape(nsteps, npar), nlls.reshape(nsteps, 2),
            accepts.reshape(nsteps, 1))


def reduce_pairs(ev_pairs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Combine per-lane (hi, lo) partials into one compensated pair
    (tests/diagnostics; the kernel's finish step does this in-kernel).

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
# mode must match this to ulp scale (FMA-contraction freedom); nll_pair
# must match to compensated precision.


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
