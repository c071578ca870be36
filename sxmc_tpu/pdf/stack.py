"""PdfStack: all of a fit's PDFs as one batched, fused evaluation.

The reference evaluates each signal's PDF on its own CUDA stream and
synchronizes (pdfz.h:17-22, mcmc.cpp:264-271).  On TPU, inter-PDF
concurrency is replaced by *batching*: every signal's MC samples are
concatenated into one array with a segment id, systematics are applied
with per-signal masks, and all histograms are built by a single
segmented bincount (one MXU matmul pipeline).  The per-step PDF
re-evaluation — the throughput-dominating operation when systematics
float (mcmc.cpp:207-209) — is then one jitted function

    (theta_syst,) -> (lut, norms)

with ``lut`` the (nsignals, nevents) PDF-value table the NLL consumes
(mcmc.cpp:230-242) and ``norms`` the in-domain counts.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sxmc_tpu.ops import histogram as hist_ops
from sxmc_tpu.ops import transforms
from sxmc_tpu.pdf import evalhist
from sxmc_tpu.signal import Observable, Signal, Systematic


@dataclasses.dataclass(frozen=True)
class MaskedSystematic:
    """A systematic + which signals it applies to (static)."""

    desc: transforms.SystematicDesc
    signal_mask: Tuple[bool, ...]


# Test hook: force stacks built while True onto the Pallas path with
# interpret-mode kernels, so the FULL production code path (packing,
# per-segment builds, fused NLL) runs under the CPU suite.  Real-TPU
# behavior is additionally pinned by smoke_tpu.py.
_FORCE_PALLAS_INTERPRET = [False]


class force_pallas_interpret:
    """Context manager: PdfStacks built inside run Pallas kernels in
    interpret mode on CPU (tests/test_fused_step.py etc.)."""

    def __enter__(self):
        _FORCE_PALLAS_INTERPRET[0] = True
        return self

    def __exit__(self, *exc):
        _FORCE_PALLAS_INTERPRET[0] = False
        return False


def _host_histogram(samples, lower, upper, nbins, pallas_scale,
                    weights=None):
    """Host (numpy) histogram bit-matching the device bin-id math.

    Used to precompute the theta-invariant histograms of *static*
    signals (signals no systematic applies to) once at stack build.
    ``pallas_scale`` selects which f32 scale convention to replicate:
    the Pallas kernel bakes ``nbins/span`` as one f64-then-f32 constant
    (ops/pallas_hist.py), while the jnp path divides two f32 values
    (ops/histogram.py compute_bin_ids) — 1-ulp different in general.
    Unweighted counts are integers (exact either way); weighted sums
    accumulate here in f64, at least as accurate as the device paths.
    """
    samples = np.asarray(samples, np.float32)
    nobs = len(nbins)
    strides = hist_ops.bin_strides(nbins)
    n = samples.shape[0]
    valid = np.ones(n, bool)
    ids = np.zeros(n, np.int64)
    for i in range(nobs):
        lo = np.float32(lower[i])
        up = np.float32(upper[i])
        col = samples[:, i]
        valid &= (col >= lo) & (col < up)
        if pallas_scale:
            scale = np.float32(float(nbins[i]) /
                               (float(upper[i]) - float(lower[i])))
        else:
            scale = np.float32(np.float32(nbins[i]) / (up - lo))
        axis = np.floor((col - lo) * scale).astype(np.int32)
        np.clip(axis, 0, nbins[i] - 1, out=axis)
        ids += axis.astype(np.int64) * strides[i]
    total = hist_ops.total_bins(nbins)
    if weights is None:
        h = np.bincount(ids[valid], minlength=total)
    else:
        h = np.bincount(ids[valid],
                        weights=np.asarray(weights, np.float64)[valid],
                        minlength=total)
    return h.astype(np.float32)


class PdfStack:
    """Batched evaluator for all PDFs in a fit."""

    def __init__(
        self,
        signals: Sequence[Signal],
        observables: Sequence[Observable],
        systematics: Sequence[Systematic],
    ):
        self.nsignals = len(signals)
        self.nobservables = len(observables)

        nobs = self.nobservables
        lower = [0.0] * nobs
        upper = [1.0] * nobs
        nbins = [1] * nobs
        for obs in observables:
            lower[obs.field_index] = obs.lower
            upper[obs.field_index] = obs.upper
            nbins[obs.field_index] = obs.bins
        self.lower_host = tuple(float(x) for x in lower)
        self.upper_host = tuple(float(x) for x in upper)
        self.lower = jnp.asarray(lower, jnp.float32)
        self.upper = jnp.asarray(upper, jnp.float32)
        self.nbins = tuple(nbins)
        self.total_nbins = hist_ops.total_bins(self.nbins)
        self.bin_volume = hist_ops.bin_volume(lower, upper, self.nbins)

        # KDE-backed signals (pdf.evalkde) are excluded from the fused
        # binned build; their rows are overridden with grid-evaluated
        # pseudo-counts in histograms().
        from sxmc_tpu.pdf.evalkde import EvalKDE

        self._kde = tuple(
            (i, s.histogram) for i, s in enumerate(signals)
            if isinstance(s.histogram, EvalKDE))
        kde_idx = {i for i, _ in self._kde}
        self.has_kde = bool(self._kde)
        # Exact-LUT KDE signals: fits evaluate the KDE exactly at the
        # data event coordinates (no grid discretization).  The event
        # points (and precomputed rows for systematics-free KDEs) ride
        # at the tail of device_data after set_data().
        self._kde_exact = tuple(
            (i, kde) for i, kde in self._kde
            if getattr(kde, "exact_lut", False))
        self._data_points = None
        self._kde_exact_static_rows = None
        self._kde_exact_static_norms = None

        # Concatenate all binned signals' MC samples with a segment id,
        # from the host copies (never read device arrays back to host).
        sample_arrays = [
            s.histogram.samples_host if i not in kde_idx else
            np.empty((0, s.histogram.samples_host.shape[1]), np.float32)
            for i, s in enumerate(signals)]
        self.nfields = max(a.shape[1] for a in sample_arrays)
        # Full concatenation (all binned signals) — kept for the
        # event-sharded chain path (parallel/chain_sharded.py) and the
        # static-histogram precompute below.
        self.samples_host = (
            np.concatenate(sample_arrays, axis=0)
            if sum(a.shape[0] for a in sample_arrays) else
            np.empty((0, self.nfields), np.float32))
        seg = np.concatenate([
            np.full(a.shape[0], i, np.int32)
            for i, a in enumerate(sample_arrays)]) if len(sample_arrays) \
            else np.empty((0,), np.int32)
        self.segment_ids_host = seg
        self.n_mc = jnp.asarray([s.n_mc for s in signals], jnp.float32)
        self.datasets = [s.dataset for s in signals]
        # Unique dataset tags + (ndatasets, nsignals) membership mask —
        # the binned-likelihood analog of the per-event -2 dataset
        # sentinel (compute_read_bins).
        self.unique_datasets = tuple(sorted(set(self.datasets)))
        self.dataset_mask = np.asarray(
            [[1.0 if s == d else 0.0 for s in self.datasets]
             for d in self.unique_datasets], np.float32)

        # Weighted MC samples (an extension over the reference, whose
        # weights were planned-but-withdrawn).
        self.has_weights = any(s.histogram.weights is not None
                               for s in signals)
        if self.has_weights:
            w = np.concatenate([
                np.asarray(s.histogram.weights) if
                s.histogram.weights is not None
                else np.ones(a.shape[0], np.float32)
                for s, a in zip(signals, sample_arrays)])
            self.sample_weights_host = np.asarray(w, np.float32)
        else:
            self.sample_weights_host = None

        # Global systematics with per-signal application masks: signal j
        # applies systematic s iff s was attached to its PDF
        # (signal.cpp:144-165).
        self.systematics: Tuple[MaskedSystematic, ...] = tuple(
            MaskedSystematic(
                desc=transforms.SystematicDesc(
                    type=s.type,
                    obs=s.observable_field_index,
                    par_indices=tuple(s.pidx),
                    extra_field=max(s.truth_field_index, 0)),
                signal_mask=tuple(s.name in sig.systematic_names
                                  for sig in signals))
            for s in systematics)
        self.nsyst_params = sum(s.npars for s in systematics)

        self._interpret = bool(_FORCE_PALLAS_INTERPRET[0]) and \
            jax.default_backend() != "tpu"
        self.use_pallas = (jax.default_backend() == "tpu"
                           or self._interpret)

        # --- static/dynamic partition -----------------------------------
        # A binned signal no systematic applies to has a theta-INVARIANT
        # histogram: build it once on the host and skip it in every
        # per-step kernel launch.  (The reference rebuilds every PDF per
        # step, mcmc.cpp:207-209 — this is free speedup the TPU design
        # makes natural: the per-step build is one batched kernel over
        # only the dynamic segments.)
        touched = np.zeros(self.nsignals, bool)
        for ms in self.systematics:
            touched |= np.asarray(ms.signal_mask, bool)
        self._dyn_idx = tuple(
            i for i in range(self.nsignals)
            if i not in kde_idx and touched[i])
        self._static_idx = tuple(
            i for i in range(self.nsignals)
            if i not in kde_idx and not touched[i])
        self._ndyn = len(self._dyn_idx)

        if self._static_idx:
            stat_h = []
            stat_n = []
            for i in self._static_idx:
                w_i = (np.asarray(signals[i].histogram.weights,
                                  np.float32)
                       if signals[i].histogram.weights is not None
                       else None)
                h = _host_histogram(
                    sample_arrays[i][:, :nobs], lower, upper,
                    self.nbins, pallas_scale=self.use_pallas,
                    weights=w_i)
                stat_h.append(h)
                stat_n.append(h.sum(dtype=np.float64))
            self._static_hists_np = np.stack(stat_h).astype(np.float32)
            self._static_norms_np = np.asarray(stat_n, np.float32)
        else:
            self._static_hists_np = None
            self._static_norms_np = None

        # Dynamic-only arrays feed the per-step kernels.
        dyn_arrays = [sample_arrays[i] for i in self._dyn_idx]
        if self._ndyn == 0:
            # No dynamic signal: one out-of-domain dummy row keeps the
            # packed shapes legal; the kernel is never launched.
            dyn_arrays = [np.full((1, self.nfields), lower[0] - 1e9,
                                  np.float32)]
        dyn_samples = np.concatenate(dyn_arrays, axis=0)
        dyn_seg = np.concatenate([
            np.full(a.shape[0], j, np.int32)
            for j, a in enumerate(dyn_arrays)])
        self._dyn_has_weights = self.has_weights and any(
            signals[i].histogram.weights is not None
            for i in self._dyn_idx)
        if self._dyn_has_weights:
            dyn_weights = np.concatenate([
                np.asarray(signals[i].histogram.weights, np.float32)
                if signals[i].histogram.weights is not None
                else np.ones(sample_arrays[i].shape[0], np.float32)
                for i in self._dyn_idx])
        else:
            dyn_weights = None

        # Per-signal masks restricted to the dynamic segments (static
        # entries are all-False by construction).  Systematics touching
        # no dynamic segment (KDE-only) drop out of the kernels.
        dyn_systs = []
        for ms in self.systematics:
            m = tuple(ms.signal_mask[i] for i in self._dyn_idx)
            if any(m):
                dyn_systs.append(MaskedSystematic(ms.desc, m))
        self._systematics_dyn = tuple(dyn_systs)

        self.samples = jnp.asarray(dyn_samples)
        self.segment_ids = jnp.asarray(dyn_seg)
        self.sample_weights = (jnp.asarray(dyn_weights)
                               if dyn_weights is not None else None)

        nseg_build = max(self._ndyn, 1)
        self._packed = None
        self._per_segment = False
        if self.use_pallas:
            from sxmc_tpu.ops import pallas_hist

            # Many-signal builds use the per-segment kernel: samples
            # are segment-sorted and padded so each kernel chunk holds
            # exactly one signal, keeping the one-hot split at
            # O(sqrt(total_nbins)) instead of O(nsignals * nbins / 128)
            # (the 5x pdfz_group gap of round 1).  Gated on the
            # (ndyn, b1, b2) accumulator fitting VMEM comfortably.
            b1, b2, _ = pallas_hist._balanced_split(self.total_nbins)
            acc_bytes = nseg_build * b1 * max(b2, 128) * 4
            # Per-segment even for a single dynamic signal: the batched
            # multi-chain build (histograms_batch) rides this kernel.
            self._per_segment = (self._ndyn >= 1 and
                                 acc_bytes <= (4 << 20))
            if self._per_segment:
                from sxmc_tpu.ops import autotune

                # Heuristic chunk, overridden by a recorded autotune
                # verdict for this shape when one exists (the
                # reference's tune-at-first-eval feedback, pdfz.cpp:
                # 622-814, amortized through a persisted cache).
                heuristic = pallas_hist.pick_segment_chunk(
                    np.bincount(dyn_seg, minlength=nseg_build))
                self._seg_chunk = autotune.tuned_chunk(
                    "segmented", self.total_nbins, nseg_build,
                    int(dyn_samples.shape[0]), heuristic)
                packed, chunk_seg = pallas_hist.pack_samples_per_segment(
                    dyn_samples, lower, dyn_seg,
                    nseg_build, chunk=self._seg_chunk,
                    weights=dyn_weights)
                self._packed = jnp.asarray(packed)
                self._chunk_seg = chunk_seg  # host numpy (embeds in jit)
                rows = []
                systs = []
                for ms in self._systematics_dyn:
                    if all(ms.signal_mask):
                        systs.append((ms.desc, None))
                    else:
                        systs.append((ms.desc, len(rows)))
                        rows.append([int(b) for b in ms.signal_mask])
                self._pallas_systs = tuple(systs)
                self._mask_matrix = (
                    np.asarray(rows, np.int32) if rows
                    else np.ones((1, nseg_build), np.int32))
            else:
                self._packed = jnp.asarray(pallas_hist.pack_samples(
                    dyn_samples, lower,
                    segment_ids=dyn_seg if nseg_build > 1 else None,
                    weights=dyn_weights))
                self._pallas_systs = tuple(
                    (ms.desc,
                     None if all(ms.signal_mask) else
                     tuple(int(b) for b in ms.signal_mask))
                    for ms in self._systematics_dyn)

        self._read_bins = None  # (nsignals, nevents) after set_data
        self._fused_hist_init = None  # lazy (_fused_setup)

    # ------------------------------------------------------------------
    # Fused step path: one Pallas launch for rebuild + LUT + event
    # log-sum (ops.pallas_step) — the roofline path SURVEY §2.1 names.

    @property
    def supports_fused(self) -> bool:
        """True when the single-launch fused NLL path applies: pallas
        per-segment stacks without KDE rows, with >= 1 dynamic
        segment.  Weighted MC samples ride the fused path too (since
        r5): their norms accumulate as compensated TwoSum pairs per MC
        chunk in-kernel, so the fused NLL agrees with the split path
        to ~1 ulp of the norm rather than bit-exactly (the unweighted
        integer-count path stays bit-exact)."""
        return (self.use_pallas and self._per_segment
                and not self.has_kde and self._ndyn >= 1)

    def _fused_setup(self) -> None:
        """Host-side constants for the fused kernel (lazy, once)."""
        if self._fused_hist_init is not None:
            return
        from sxmc_tpu.ops.pallas_hist import _balanced_split

        b1, b2, _ = _balanced_split(self.total_nbins)
        hist_init = np.zeros((self.nsignals, b1, b2), np.float32)
        if self._static_idx:
            flat = np.zeros((len(self._static_idx), b1 * b2),
                            np.float32)
            flat[:, :self.total_nbins] = self._static_hists_np
            hist_init[np.asarray(self._static_idx)] = flat.reshape(
                -1, b1, b2)
        # chunk_seg remapped from dynamic-segment ids to GLOBAL signal
        # indices (static rows hold their precomputed values).
        dyn_map = np.asarray(self._dyn_idx, np.int32)
        self._fused_chunk_seg = dyn_map[self._chunk_seg]
        rows = []
        systs = []
        for ms in self._systematics_dyn:
            if all(ms.signal_mask):
                systs.append((ms.desc, None))
            else:
                g = np.zeros(self.nsignals, np.int32)
                for j, dyn_i in enumerate(self._dyn_idx):
                    g[dyn_i] = int(ms.signal_mask[j])
                systs.append((ms.desc, len(rows)))
                rows.append(g)
        self._fused_systs = tuple(systs)
        self._fused_mask_matrix = (
            np.asarray(rows, np.int32) if rows
            else np.ones((1, self.nsignals), np.int32))
        self._fused_b1b2 = (b1, b2)
        self._fused_hist_init = hist_init
        # Weighted stacks: initial per-signal norms for the kernel's
        # compensated accumulator (static rows keep their host-f64
        # weighted sums; dynamic rows start at 0 and accumulate).
        if self.has_weights:
            norm_init = np.zeros(self.nsignals, np.float32)
            if self._static_idx:
                norm_init[np.asarray(self._static_idx)] = \
                    self._static_norms_np
            self._fused_norm_init = norm_init[None, :]
        else:
            self._fused_norm_init = None

    def fused_nll_pair(self, params: jnp.ndarray, read_bins, device_data,
                       st) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Compensated unbinned NLL in ONE Pallas launch.

        Semantically identical to ``nll_pair(params,
        *self.evaluate(theta), st)`` — histogram values and per-event
        densities are bit-identical; only the reduction grouping
        differs (compensated either way).  The kernel finishes the NLL
        in its last grid step (w-term, constraints, barrier), so no
        XLA epilogue runs at all.  ``params`` may be ``(nparams,)`` or
        ``(nchains, nparams)`` — the batched form is one kernel launch
        that reads each MC chunk once and unrolls the chains (the
        lock-step multi-chain step).
        """
        from sxmc_tpu.ops import pallas_step
        from sxmc_tpu.ops.pallas_hist import LANES

        if not self.supports_fused:
            raise NotImplementedError(
                "fused NLL requires a pallas per-segment stack "
                "without KDE rows")
        self._fused_setup()
        params = jnp.asarray(params, jnp.float32)

        b1, b2 = self._fused_b1b2
        nev = read_bins.shape[-1]
        ev_chunk = pallas_step.pick_event_chunk(
            nev, self.nsignals, b1, b2,
            nch=params.shape[0] if params.ndim == 2 else 1)
        npad = -(-nev // ev_chunk) * ev_chunk
        rb = jnp.pad(jnp.asarray(read_bins, jnp.int32),
                     ((0, 0), (0, npad - nev)), constant_values=-2)
        rb = rb.reshape(self.nsignals, npad // LANES, LANES)

        _, _, nll = pallas_step.pallas_fused_step(
            device_data[0], self._fused_chunk_seg,
            self._fused_mask_matrix,
            jnp.asarray(self._fused_hist_init), rb, params,
            norm_init=self._fused_norm_init,
            nfields=self.nfields, nobs=self.nobservables,
            systematics=self._fused_systs,
            lower=self.lower_host, upper=self.upper_host,
            nbins=self.nbins, nsignals=self.nsignals,
            mc_chunk=self._seg_chunk, ev_chunk=ev_chunk,
            n_mc=tuple(float(x) for x in np.asarray(self.n_mc)),
            bin_volume=self.bin_volume,
            nexpected=tuple(float(x) for x in st.nexpected),
            source_id=tuple(int(x) for x in st.source_id),
            means=tuple(float(x) for x in st.means),
            sigmas=tuple(float(x) for x in st.sigmas),
            nsources=int(st.nsources),
            interpret=self._interpret)
        return nll[..., 0], nll[..., 1]

    def fused_segment(self, params0, nll0_pair, width, read_bins,
                      device_data, noise, log_u, st,
                      debug_mode: bool = False, beta=None):
        """A whole Metropolis segment in ONE Pallas launch
        (ops.pallas_step.pallas_fused_segment): per step the kernel
        proposes from presampled ``noise``, rebuilds, evaluates the
        compensated NLL (shared code with :meth:`fused_nll_pair`, so
        bit-identical per proposal), and applies the log-space accept
        against presampled ``log_u`` — no per-step XLA dispatch at all.

        Returns ``(samples, nlls, accepts)`` with the scan history
        layout of ``metropolis.run_segment``.

        Experiment-grouped form (the sharded-ensemble shard body):
        pass ``read_bins`` as ``(nexp, nsignals, nevents)`` with
        ``params0 (nexp, chains_per_exp, npar)`` (``nll0_pair``,
        ``width``, ``noise``, ``log_u`` carrying the same two leading
        batch axes after ``nsteps``); histories come back as
        ``(nsteps, nexp, chains_per_exp, ...)``.  Per-chain
        trajectories are bit-identical to the shared-dataset form run
        with that experiment's rb (same ev_chunk).
        """
        from sxmc_tpu.ops import pallas_step
        from sxmc_tpu.ops.pallas_hist import LANES

        if not self.supports_fused:
            raise NotImplementedError(
                "fused segment requires a pallas per-segment stack "
                "without KDE rows")
        self._fused_setup()

        b1, b2 = self._fused_b1b2
        nev = read_bins.shape[-1]
        grouped = read_bins.ndim == 3
        if grouped:
            nexp, cpe, npar = params0.shape
            assert read_bins.shape[0] == nexp
            nch = nexp * cpe
            nsteps = noise.shape[0]
        else:
            nexp, cpe = 1, None
            nch = params0.shape[0] if params0.ndim == 2 else 1
        ev_chunk = pallas_step.pick_event_chunk(
            nev, self.nsignals, b1, b2, nch=nch, nexp=nexp)
        npad = -(-nev // ev_chunk) * ev_chunk
        pad_width = [(0, 0)] * (read_bins.ndim - 1) \
            + [(0, npad - nev)]
        rb = jnp.pad(jnp.asarray(read_bins, jnp.int32), pad_width,
                     constant_values=-2)
        rb = rb.reshape(tuple(read_bins.shape[:-1])
                        + (npad // LANES, LANES))
        nll0 = jnp.stack([jnp.asarray(nll0_pair[0], jnp.float32),
                          jnp.asarray(nll0_pair[1], jnp.float32)],
                         axis=-1)
        if grouped:
            w = jnp.asarray(width, jnp.float32)
            w_in = (w.reshape(nch, npar, npar) if w.ndim == 4
                    else w.reshape(nch, npar))
            samples, nlls, accs = pallas_step.pallas_fused_segment(
                device_data[0], self._fused_chunk_seg,
                self._fused_mask_matrix,
                jnp.asarray(self._fused_hist_init), rb,
                jnp.asarray(params0, jnp.float32).reshape(nch, npar),
                nll0.reshape(nch, 2),
                w_in,
                jnp.asarray(noise, jnp.float32).reshape(
                    nsteps, nch, npar),
                jnp.asarray(log_u, jnp.float32).reshape(nsteps, nch),
                norm_init=self._fused_norm_init,
                beta=beta,
                nfields=self.nfields, nobs=self.nobservables,
                systematics=self._fused_systs,
                lower=self.lower_host, upper=self.upper_host,
                nbins=self.nbins, nsignals=self.nsignals,
                mc_chunk=self._seg_chunk, ev_chunk=ev_chunk,
                n_mc=tuple(float(x) for x in np.asarray(self.n_mc)),
                bin_volume=self.bin_volume,
                nexpected=tuple(float(x) for x in st.nexpected),
                source_id=tuple(int(x) for x in st.source_id),
                means=tuple(float(x) for x in st.means),
                sigmas=tuple(float(x) for x in st.sigmas),
                nsources=int(st.nsources),
                nsteps=nsteps, debug_mode=bool(debug_mode),
                interpret=self._interpret)
            return (samples.reshape(nsteps, nexp, cpe, npar),
                    nlls.reshape(nsteps, nexp, cpe, 2),
                    accs.reshape(nsteps, nexp, cpe))

        return pallas_step.pallas_fused_segment(
            device_data[0], self._fused_chunk_seg,
            self._fused_mask_matrix,
            jnp.asarray(self._fused_hist_init), rb,
            jnp.asarray(params0, jnp.float32), nll0,
            jnp.asarray(width, jnp.float32),
            jnp.asarray(noise, jnp.float32),
            jnp.asarray(log_u, jnp.float32),
            norm_init=self._fused_norm_init,
            beta=beta,
            nfields=self.nfields, nobs=self.nobservables,
            systematics=self._fused_systs,
            lower=self.lower_host, upper=self.upper_host,
            nbins=self.nbins, nsignals=self.nsignals,
            mc_chunk=self._seg_chunk, ev_chunk=ev_chunk,
            n_mc=tuple(float(x) for x in np.asarray(self.n_mc)),
            bin_volume=self.bin_volume,
            nexpected=tuple(float(x) for x in st.nexpected),
            source_id=tuple(int(x) for x in st.source_id),
            means=tuple(float(x) for x in st.means),
            sigmas=tuple(float(x) for x in st.sigmas),
            nsources=int(st.nsources),
            nsteps=int(noise.shape[0]), debug_mode=bool(debug_mode),
            interpret=self._interpret)

    def fused_segment_blocked(self, params0, nll0_pair, width,
                              read_bins, device_data, noise, log_u,
                              st, rate_substeps: int,
                              debug_mode: bool = False):
        """A whole blocked Metropolis-within-Gibbs segment in ONE
        Pallas launch (ops.pallas_step.pallas_fused_segment_blocked):
        per cycle, one systematic-block rebuild + ``rate_substeps``
        rate-block decisions that reuse the carried current histogram
        in VMEM — each rate move costs one event sweep instead of the
        scan path's launch + dispatch.  Unweighted stacks only.

        Layouts: ``noise`` is ``(nsteps, M+1, npar)`` for one chain,
        ``(nsteps, M+1, nch, npar)`` batched, ``(nsteps, M+1, nexp,
        cpe, npar)`` grouped — row 0 of the M+1 axis is the
        systematic block (metropolis._presample's blocked streams);
        ``log_u`` drops the trailing npar.  Other shapes follow
        :meth:`fused_segment`, including the experiment-grouped form.
        """
        from sxmc_tpu.ops import pallas_step
        from sxmc_tpu.ops.pallas_hist import LANES

        if not self.supports_fused or self.has_weights:
            raise NotImplementedError(
                "blocked fused segment requires an unweighted pallas "
                "per-segment stack without KDE rows")
        self._fused_setup()

        b1, b2 = self._fused_b1b2
        nev = read_bins.shape[-1]
        grouped = read_bins.ndim == 3
        nsub = rate_substeps + 1
        if grouped:
            nexp, cpe, npar = params0.shape
            nch = nexp * cpe
            nsteps = noise.shape[0]
        else:
            nexp, cpe = 1, None
            nch = params0.shape[0] if params0.ndim == 2 else 1
            npar = params0.shape[-1]
            nsteps = noise.shape[0]
        ev_chunk = pallas_step.pick_event_chunk(
            nev, self.nsignals, b1, b2, nch=nch, nexp=nexp)
        npad = -(-nev // ev_chunk) * ev_chunk
        pad_width = [(0, 0)] * (read_bins.ndim - 1) \
            + [(0, npad - nev)]
        rb = jnp.pad(jnp.asarray(read_bins, jnp.int32), pad_width,
                     constant_values=-2)
        rb = rb.reshape(tuple(read_bins.shape[:-1])
                        + (npad // LANES, LANES))
        nll0 = jnp.stack([jnp.asarray(nll0_pair[0], jnp.float32),
                          jnp.asarray(nll0_pair[1], jnp.float32)],
                         axis=-1)
        p0_flat = jnp.asarray(params0, jnp.float32).reshape(nch, npar)

        common = dict(
            nfields=self.nfields, nobs=self.nobservables,
            systematics=self._fused_systs,
            lower=self.lower_host, upper=self.upper_host,
            nbins=self.nbins, nsignals=self.nsignals,
            mc_chunk=self._seg_chunk, ev_chunk=ev_chunk,
            n_mc=tuple(float(x) for x in np.asarray(self.n_mc)),
            bin_volume=self.bin_volume,
            nexpected=tuple(float(x) for x in st.nexpected),
            source_id=tuple(int(x) for x in st.source_id),
            means=tuple(float(x) for x in st.means),
            sigmas=tuple(float(x) for x in st.sigmas),
            nsources=int(st.nsources), interpret=self._interpret)

        # The current state's full histogram at params0 (hist is
        # rb-independent, so the shared one-shot kernel provides it
        # with any rb slice — one extra launch per SEGMENT).
        rb_any = rb[0] if grouped else rb
        hist_cur0, _, _ = pallas_step.pallas_fused_step(
            device_data[0], self._fused_chunk_seg,
            self._fused_mask_matrix,
            jnp.asarray(self._fused_hist_init), rb_any, p0_flat,
            **common)

        samples, nlls, accs = pallas_step.pallas_fused_segment_blocked(
            device_data[0], self._fused_chunk_seg,
            self._fused_mask_matrix,
            jnp.asarray(self._fused_hist_init), hist_cur0, rb,
            p0_flat, nll0.reshape(nch, 2),
            jnp.asarray(width, jnp.float32).reshape(nch, npar),
            jnp.asarray(noise, jnp.float32).reshape(
                nsteps, nsub, nch, npar),
            jnp.asarray(log_u, jnp.float32).reshape(
                nsteps, nsub, nch),
            nsteps=nsteps, rate_substeps=rate_substeps,
            debug_mode=bool(debug_mode), **common)
        if grouped:
            return (samples.reshape(nsteps, nexp, cpe, npar),
                    nlls.reshape(nsteps, nexp, cpe, 2),
                    accs.reshape(nsteps, nexp, cpe))
        if params0.ndim == 1:
            # The kernel always sees the (nch, npar) form; unwrap the
            # single-chain axis back to run_segment's scan layout.
            return samples[:, 0], nlls[:, 0], accs[:, 0:1]
        return samples, nlls, accs

    # ------------------------------------------------------------------

    def set_data(self, data: np.ndarray) -> None:
        """Precompute per-signal read bins for the dataset.

        ``data`` is ``(nevents, nobservables + 1)`` with the dataset tag
        last.  Data points never move under systematics, so this runs
        once per dataset (reference: pdfz.cpp:245-302, mcmc.cpp:231-242).

        With exact-LUT KDE signals the event coordinates are also kept
        on device, and the exact density rows of systematics-free KDE
        signals (theta-invariant) are computed here ONCE.
        """
        data = np.asarray(data, np.float32)
        self._read_bins = self.compute_read_bins(data)
        if self._kde_exact:
            self._data_points = jnp.asarray(data)
            nev = data.shape[0]
            rows = []
            nrms = []
            for i, kde in self._kde_exact:
                if not kde.systematics:
                    row, nrm = kde.eval_at(self._data_points)
                    rows.append(row)
                    nrms.append(nrm)
            self._kde_exact_static_rows = (
                jnp.stack(rows) if rows
                else jnp.zeros((0, nev), jnp.float32))
            self._kde_exact_static_norms = (
                jnp.stack(nrms) if nrms else jnp.zeros((0,), jnp.float32))

    @property
    def nevents(self) -> int:
        if self._read_bins is None:
            raise RuntimeError("set_data() must be called first")
        return self._read_bins.shape[1]

    def data_bin_counts(self, data: np.ndarray,
                        weights: Optional[np.ndarray] = None
                        ) -> jnp.ndarray:
        """Histogram the DATA events once, per dataset: the binned
        likelihood's sufficient statistic.

        Uses the identical bin-id math as :meth:`compute_read_bins`
        (hist_ops.compute_bin_ids), so the binned NLL regroups the
        unbinned one exactly: out-of-domain events are excluded (the
        -1 sentinel) and events whose tag matches no signal's dataset
        fall in no row (the -2 sentinel).  Supports weighted / Asimov
        events.  Batch leading axes are allowed:
        ``(..., nevents, nobs + 1) -> (..., ndatasets, total_nbins)``.
        """
        data = jnp.asarray(data, jnp.float32)
        obs = data[..., :self.nobservables]
        flat = obs.reshape(-1, self.nobservables)
        ids, valid = hist_ops.compute_bin_ids(
            flat, self.lower, self.upper, self.nbins)
        ids = ids.reshape(obs.shape[:-1])
        valid = valid.reshape(obs.shape[:-1])
        tags = data[..., self.nobservables]
        w = (jnp.ones(data.shape[:-1], jnp.float32) if weights is None
             else jnp.asarray(weights, jnp.float32))

        def one(ids1, valid1, tags1, w1):
            rows = []
            for ds in self.unique_datasets:
                sel = valid1 & (tags1 == ds)
                rows.append(hist_ops.fixed_bincount(
                    ids1, jnp.where(sel, w1, 0.0), self.total_nbins))
            return jnp.stack(rows)

        if data.ndim == 2:
            return one(ids, valid, tags, w)
        batch = ids.reshape((-1,) + ids.shape[-1:])
        out = jax.vmap(one)(batch,
                            valid.reshape(batch.shape),
                            tags.reshape(batch.shape),
                            jnp.broadcast_to(w, tags.shape).reshape(
                                batch.shape))
        return out.reshape(data.shape[:-2] +
                           (len(self.unique_datasets), self.total_nbins))

    def counts_from_read_bins(self, read_bins: jnp.ndarray,
                              weights: Optional[jnp.ndarray] = None
                              ) -> jnp.ndarray:
        """Per-dataset data bin counts derived from per-signal read
        bins INSIDE jit: ``(nsignals, nevents) -> (ndatasets,
        total_nbins)``.

        Row j of ``read_bins`` is >= 0 exactly for in-domain events
        carrying signal j's dataset tag (compute_read_bins sentinels),
        so one representative row per unique dataset recovers the
        binned sufficient statistic without a second pass over the raw
        events — and the bin ids are identical to
        :meth:`data_bin_counts` by construction.  This is what lets
        the samplers switch to the binned likelihood while still
        threading only ``read_bins`` through the jit boundary.
        """
        rep = [self.datasets.index(d) for d in self.unique_datasets]
        w = (jnp.ones(read_bins.shape[-1], jnp.float32)
             if weights is None else jnp.asarray(weights, jnp.float32))
        rows = []
        for j in rep:
            rb = read_bins[..., j, :]
            sel = rb >= 0
            rows.append(hist_ops.fixed_bincount(
                jnp.where(sel, rb, 0).astype(jnp.int32),
                jnp.where(sel, w, 0.0), self.total_nbins))
        return jnp.stack(rows, axis=-2)

    # ------------------------------------------------------------------

    @property
    def device_data(self):
        """The MC-sample device arrays, to be passed as jit ARGUMENTS.

        Capturing these as closure constants inside jit both re-ships
        them per call and degrades dispatch latency on tunneled
        backends — every jitted entry point threads them explicitly.

        After set_data(), exact-LUT KDE fits append three more arrays:
        the event coordinates and the precomputed (rows, norms) of
        systematics-free KDE signals.
        """
        kde_arrays = tuple(kde.samples for _, kde in self._kde)
        if self.use_pallas:
            dd = (self._packed,) + kde_arrays
        elif self.sample_weights is not None:
            dd = (self.samples, self.segment_ids,
                  self.sample_weights) + kde_arrays
        else:
            dd = (self.samples, self.segment_ids) + kde_arrays
        if self._kde_exact and self._data_points is not None:
            dd = dd + (self._data_points, self._kde_exact_static_rows,
                       self._kde_exact_static_norms)
        return dd

    def _dynamic_histograms(self, theta_syst, device_data):
        """(ndyn, total_nbins) counts for the dynamic segments only."""
        nseg = max(self._ndyn, 1)
        if self.use_pallas:
            from sxmc_tpu.ops import pallas_hist

            (packed,) = device_data
            if self._per_segment:
                flat = pallas_hist.pallas_histogram_segmented(
                    packed, self._chunk_seg, self._mask_matrix,
                    theta_syst,
                    nfields=self.nfields,
                    nobs=self.nobservables,
                    systematics=self._pallas_systs,
                    lower=self.lower_host, upper=self.upper_host,
                    nbins=self.nbins, nsegments=nseg,
                    chunk=self._seg_chunk, interpret=self._interpret)
            else:
                flat = pallas_hist.pallas_histogram(
                    packed, theta_syst,
                    nfields=self.nfields,
                    nobs=self.nobservables,
                    systematics=self._pallas_systs,
                    lower=self.lower_host, upper=self.upper_host,
                    nbins=self.nbins, nsegments=nseg,
                    has_weights=self._dyn_has_weights,
                    interpret=self._interpret)
            return flat.reshape(nseg, self.total_nbins)
        samples, segment_ids = device_data[0], device_data[1]
        weights = device_data[2] if len(device_data) > 2 else None
        hists, _ = _stack_histograms(
            samples, segment_ids, theta_syst,
            self.lower, self.upper, self.nbins, nseg,
            self._systematics_dyn, weights)
        return hists

    def _assemble(self, dyn_hists, theta_syst, kde_arrays):
        """Scatter dynamic + cached static (+ KDE) rows into the full
        (nsignals, total_nbins) table."""
        if (self._ndyn == self.nsignals and not self._kde):
            hists = dyn_hists
        else:
            hists = jnp.zeros((self.nsignals, self.total_nbins),
                              jnp.float32)
            if self._ndyn:
                hists = hists.at[np.asarray(self._dyn_idx)].set(
                    dyn_hists[:self._ndyn])
            if self._static_idx:
                hists = hists.at[np.asarray(self._static_idx)].set(
                    self._static_hists_np)
        norms = hists.sum(axis=1)
        # KDE-backed rows: grid-evaluated pseudo-counts replace the
        # (empty) binned rows, same counts/norm contract.
        for (i, kde), arr in zip(self._kde, kde_arrays):
            cnt, nrm = kde.histogram(theta_syst, samples=arr)
            hists = hists.at[i].set(cnt)
            norms = norms.at[i].set(nrm)
        return hists, norms

    def _split_device_data(self, device_data):
        """-> (binned arrays, kde sample arrays, exact-kde extras).

        ``extras`` is None, or ``(points, static_rows, static_norms)``
        when the snapshot was taken after set_data() on an exact-KDE
        stack.
        """
        nbase = (1 if self.use_pallas else
                 (3 if self.sample_weights is not None else 2))
        extras = None
        if len(device_data) == nbase + len(self._kde) + 3:
            extras = device_data[-3:]
            device_data = device_data[:-3]
        nkde = len(self._kde)
        kde_arrays = device_data[len(device_data) - nkde:] if nkde else ()
        binned = device_data[:len(device_data) - nkde] if nkde \
            else device_data
        return binned, kde_arrays, extras

    def histograms(self, theta_syst: jnp.ndarray, device_data=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(nsignals, total_nbins) counts + (nsignals,) norms at theta."""
        theta_syst = jnp.asarray(theta_syst, jnp.float32)
        if device_data is None:
            device_data = self.device_data
        # KDE sample arrays ride at the tail of device_data (explicit
        # jit arguments, never closure constants).
        binned_data, kde_arrays, _ = self._split_device_data(device_data)
        if self._ndyn:
            dyn_hists = self._dynamic_histograms(theta_syst, binned_data)
        else:
            dyn_hists = None
        return self._assemble(dyn_hists, theta_syst, kde_arrays)

    def compute_read_bins(self, data: np.ndarray) -> jnp.ndarray:
        """Per-signal read bins for a dataset, as an explicit array.

        Events with an unknown dataset tag get the -2 sentinel and
        contribute zero density — padding rows (tag e.g. -1) are thus
        free, which is how ragged experiment batches are vmapped.
        """
        data = jnp.asarray(data)
        obs = data[..., :self.nobservables]
        ids, valid = hist_ops.compute_bin_ids(
            obs.reshape(-1, self.nobservables), self.lower, self.upper,
            self.nbins)
        ids = ids.reshape(obs.shape[:-1])
        valid = valid.reshape(obs.shape[:-1])
        tags = data[..., self.nobservables]
        rb = []
        for ds in self.datasets:
            sig_ids = jnp.where(tags == ds, ids, -2)
            rb.append(jnp.where(valid, sig_ids, -1))
        return jnp.stack(rb, axis=-2)  # (..., nsignals, nevents)

    def _exact_kde_override(self, lut, norms, theta_syst, device_data):
        """Replace exact-LUT KDE rows of (lut, norms) with the KDE
        density evaluated at the event coordinates (no grid bias).

        Systematics-free KDE rows come precomputed from set_data();
        theta-dependent ones re-evaluate exactly each call.
        """
        _, kde_arrays, extras = self._split_device_data(device_data)
        if extras is None:
            raise RuntimeError(
                "use_exact_kde requires a device_data snapshot taken "
                "after set_data() (exact rows are per-dataset)")
        points, static_rows, static_norms = extras
        kde_map = {i: arr for (i, _), arr in zip(self._kde, kde_arrays)}
        slot = 0
        for i, kde in self._kde_exact:
            if kde.systematics:
                row, nrm = kde.eval_at(points, theta_syst,
                                       samples=kde_map[i])
            else:
                row, nrm = static_rows[slot], static_norms[slot]
                slot += 1
            lut = lut.at[..., i, :].set(row)
            norms = norms.at[..., i].set(nrm)
        return lut, norms

    def evaluate(self, theta_syst: jnp.ndarray, read_bins=None,
                 device_data=None, use_exact_kde: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused re-histogram + LUT build: theta -> (lut, norms).

        This is the inner loop of the MCMC when systematics float.
        ``use_exact_kde=True`` (sampler fit paths only: read_bins must
        correspond to the set_data() dataset) evaluates exact-LUT KDE
        signals at the true event coordinates instead of the bin grid.
        """
        if read_bins is None:
            if self._read_bins is None:
                raise RuntimeError("set_data() must be called first")
            read_bins = self._read_bins
        if device_data is None:
            device_data = self.device_data
        hists, norms = self.histograms(theta_syst, device_data)
        if self.use_pallas:
            # Fused MXU gather (pallas_eval_lut) instead of XLA's slow
            # dynamic gather.
            from sxmc_tpu.ops import pallas_hist

            nev = read_bins.shape[-1]
            chunk = min(pallas_hist.DEFAULT_CHUNK,
                        max(-(-nev // 128) * 128, 128))
            npad = -(-nev // chunk) * chunk
            rb = jnp.pad(read_bins, ((0, 0), (0, npad - nev)),
                         constant_values=-2)
            rb = rb.reshape(self.nsignals, npad // 128, 128)
            lut = pallas_hist.pallas_eval_lut(
                hists.reshape(-1), norms, rb,
                total_nbins=self.total_nbins, nsegments=self.nsignals,
                bin_volume=self.bin_volume, chunk=chunk,
                interpret=self._interpret)[:, :nev]
        else:
            lut = jax.vmap(evalhist.eval_from_bins,
                           in_axes=(0, 0, None, 0))(
                hists, norms, self.bin_volume, read_bins)
        if use_exact_kde and self._kde_exact:
            lut, norms = self._exact_kde_override(
                lut, norms, theta_syst, device_data)
        return lut, norms

    def efficiencies(self, theta_syst) -> jnp.ndarray:
        """Per-signal norm/n_mc at the given systematics."""
        _, norms = self.histograms(jnp.asarray(theta_syst, jnp.float32))
        return norms / self.n_mc

    # ------------------------------------------------------------------
    # Batched multi-chain evaluation: the nchains thetas of a vmapped
    # sampler step become ONE kernel launch that reads every MC chunk
    # once and unrolls the chains (vs nchains independent rebuilds).

    def histograms_batch(self, thetas: jnp.ndarray, device_data=None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(nchains, nsignals, total_nbins) counts + norms at thetas."""
        thetas = jnp.asarray(thetas, jnp.float32)
        if device_data is None:
            device_data = self.device_data
        nchains = thetas.shape[0]
        if (self.use_pallas and self._per_segment and not self.has_kde):
            from sxmc_tpu.ops import pallas_hist

            b1, b2, _ = pallas_hist._balanced_split(self.total_nbins)
            acc = nchains * self._ndyn * b1 * max(b2, 128) * 4
            if acc > (4 << 20):
                # Batched accumulator would not fit VMEM (huge toy
                # batches): fall back to vmapped single builds.
                return jax.vmap(
                    lambda t: self.histograms(t, device_data))(thetas)
            packed = device_data[0]
            flat = pallas_hist.pallas_histogram_segmented(
                packed, self._chunk_seg, self._mask_matrix, thetas,
                nfields=self.nfields, nobs=self.nobservables,
                systematics=self._pallas_systs,
                lower=self.lower_host, upper=self.upper_host,
                nbins=self.nbins, nsegments=self._ndyn,
                chunk=self._seg_chunk, interpret=self._interpret)
            dyn = flat.reshape(nchains, self._ndyn, self.total_nbins)
            if self._ndyn == self.nsignals:
                hists = dyn
            else:
                hists = jnp.zeros(
                    (nchains, self.nsignals, self.total_nbins),
                    jnp.float32)
                hists = hists.at[:, np.asarray(self._dyn_idx)].set(dyn)
                if self._static_idx:
                    hists = hists.at[:, np.asarray(self._static_idx)
                                     ].set(self._static_hists_np[None])
            return hists, hists.sum(axis=2)
        if (self.use_pallas and not self.has_kde and self._ndyn == 0):
            # Fully static mix: one (shared) table broadcast per chain.
            hists1, norms1 = self.histograms(thetas[0], device_data)
            hists = jnp.broadcast_to(
                hists1[None], (nchains,) + hists1.shape)
            norms = jnp.broadcast_to(norms1[None], (nchains,)
                                     + norms1.shape)
            return hists, norms
        return jax.vmap(lambda t: self.histograms(t, device_data))(thetas)

    def evaluate_batch(self, thetas: jnp.ndarray, read_bins=None,
                       device_data=None, use_exact_kde: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched (lut, norms): thetas (nchains, nsyst) ->
        ((nchains, nsignals, nevents), (nchains, nsignals))."""
        if read_bins is None:
            if self._read_bins is None:
                raise RuntimeError("set_data() must be called first")
            read_bins = self._read_bins
        if device_data is None:
            device_data = self.device_data
        thetas = jnp.asarray(thetas, jnp.float32)
        hists, norms = self.histograms_batch(thetas, device_data)
        nchains = thetas.shape[0]
        if self.use_pallas:
            from sxmc_tpu.ops import pallas_hist

            nev = read_bins.shape[-1]
            chunk = min(pallas_hist.DEFAULT_CHUNK,
                        max(-(-nev // 128) * 128, 128))
            npad = -(-nev // chunk) * chunk
            rb = jnp.pad(read_bins, ((0, 0), (0, npad - nev)),
                         constant_values=-2)
            rb = rb.reshape(self.nsignals, npad // 128, 128)
            # Chains reuse the same read bins: the flattened
            # (nchains * nsignals) segment axis walks hists in order.
            rb_t = jnp.broadcast_to(
                rb[None], (nchains,) + rb.shape).reshape(
                    nchains * self.nsignals, npad // 128, 128)
            lut = pallas_hist.pallas_eval_lut(
                hists.reshape(-1), norms.reshape(-1), rb_t,
                total_nbins=self.total_nbins,
                nsegments=nchains * self.nsignals,
                bin_volume=self.bin_volume, chunk=chunk,
                interpret=self._interpret)[:, :nev]
            lut = lut.reshape(nchains, self.nsignals, nev)
        else:
            lut = jax.vmap(
                lambda h, n: jax.vmap(
                    evalhist.eval_from_bins, in_axes=(0, 0, None, 0))(
                        h, n, self.bin_volume, read_bins))(hists, norms)
        if use_exact_kde and self._kde_exact:
            nev = lut.shape[-1]
            _, kde_arrays, extras = self._split_device_data(device_data)
            if extras is None:
                raise RuntimeError(
                    "use_exact_kde requires a device_data snapshot "
                    "taken after set_data()")
            points, static_rows, static_norms = extras
            kde_map = {i: arr
                       for (i, _), arr in zip(self._kde, kde_arrays)}
            slot = 0
            for i, kde in self._kde_exact:
                if kde.systematics:
                    rows, nrms = jax.vmap(
                        lambda t, _i=i, _k=kde: _k.eval_at(
                            points, t, samples=kde_map[_i]))(thetas)
                else:
                    rows = jnp.broadcast_to(
                        static_rows[slot][None], (nchains, nev))
                    nrms = jnp.broadcast_to(static_norms[slot][None],
                                            (nchains,))
                    slot += 1
                lut = lut.at[:, i].set(rows)
                norms = norms.at[:, i].set(nrms)
        return lut, norms


def _apply_masked_systematics(samples, segment_ids, theta, systematics,
                              nsignals):
    """Apply each systematic only to samples of signals that carry it."""
    if not systematics:
        return samples
    cols = [samples[:, i] for i in range(samples.shape[1])]
    for ms in systematics:
        desc = ms.desc
        x = cols[desc.obs]
        if all(ms.signal_mask):
            mask = None
        else:
            mask_per_signal = jnp.asarray(ms.signal_mask)
            mask = mask_per_signal[segment_ids]
        p = jnp.zeros_like(x)
        xi = jnp.ones_like(x)
        for i, pidx in enumerate(desc.par_indices):
            if i > 0:
                xi = xi * x
            p = p + theta[pidx].astype(x.dtype) * xi
        if desc.type == transforms.SHIFT:
            new = x + p
        elif desc.type == transforms.SCALE:
            new = x * (1.0 + p)
        elif desc.type == transforms.CTSCALE:
            new = 1.0 + (x - 1.0) * (1.0 + p)
        elif desc.type == transforms.RESOLUTION_SCALE:
            new = x + p * (x - cols[desc.extra_field])
        else:
            raise ValueError(f"Unknown systematic type id {desc.type}")
        cols[desc.obs] = new if mask is None else jnp.where(mask, new, x)
    return jnp.stack(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("nbins", "nsignals", "systematics"))
def _stack_histograms(samples, segment_ids, theta, lower, upper, nbins,
                      nsignals, systematics, weights=None):
    transformed = _apply_masked_systematics(
        samples, segment_ids, theta, systematics, nsignals)
    nobs = len(nbins)
    return hist_ops.segmented_histogram(
        transformed[:, :nobs], segment_ids,
        jnp.ones(samples.shape[0], bool), lower, upper, nbins, nsignals,
        weights=weights)
