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
from typing import Sequence, Tuple

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

        # Concatenate all binned signals' MC samples with a segment id,
        # from the host copies (never read device arrays back to host).
        sample_arrays = [
            s.histogram.samples_host if i not in kde_idx else
            np.empty((0, s.histogram.samples_host.shape[1]), np.float32)
            for i, s in enumerate(signals)]
        if sum(a.shape[0] for a in sample_arrays) == 0:
            # All-KDE fit: one out-of-domain dummy row keeps the fused
            # build's shapes legal; it contributes nothing.
            sample_arrays[0] = np.full(
                (1, signals[0].histogram.samples_host.shape[1]),
                lower[0] - 1e9, np.float32)
        self.samples_host = np.concatenate(sample_arrays, axis=0)
        self.samples = jnp.asarray(self.samples_host)
        seg = np.concatenate([
            np.full(a.shape[0], i, np.int32)
            for i, a in enumerate(sample_arrays)])
        self.segment_ids_host = seg
        self.segment_ids = jnp.asarray(seg)
        self.n_mc = jnp.asarray([s.n_mc for s in signals], jnp.float32)
        self.datasets = [s.dataset for s in signals]

        # Weighted MC samples (an extension over the reference, whose
        # weights were planned-but-withdrawn): any weighted signal
        # forces the jnp histogram path.
        self.has_weights = any(s.histogram.weights is not None
                               for s in signals)
        if self.has_weights:
            w = np.concatenate([
                np.asarray(s.histogram.weights) if
                s.histogram.weights is not None
                else np.ones(a.shape[0], np.float32)
                for s, a in zip(signals, sample_arrays)])
            self.sample_weights_host = np.asarray(w, np.float32)
            self.sample_weights = jnp.asarray(w, jnp.float32)
        else:
            self.sample_weights_host = None
            self.sample_weights = None

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

        self.use_pallas = jax.default_backend() == "tpu"
        self._packed = None
        self._per_segment = False
        if self.use_pallas:
            from sxmc_tpu.ops import pallas_hist

            # Many-signal builds use the per-segment kernel: samples
            # are segment-sorted and padded so each kernel chunk holds
            # exactly one signal, keeping the one-hot split at
            # O(sqrt(total_nbins)) instead of O(nsignals * nbins / 128)
            # (the 5x pdfz_group gap of round 1).  Gated on the
            # (nsignals, b1, b2) accumulator fitting VMEM comfortably.
            b1, b2, _ = pallas_hist._balanced_split(self.total_nbins)
            acc_bytes = self.nsignals * b1 * max(b2, 128) * 4
            self._per_segment = (self.nsignals > 1 and
                                 acc_bytes <= (4 << 20))
            if self._per_segment:
                from sxmc_tpu.ops import autotune

                # Heuristic chunk, overridden by a recorded autotune
                # verdict for this shape when one exists (the
                # reference's tune-at-first-eval feedback, pdfz.cpp:
                # 622-814, amortized through a persisted cache).
                heuristic = pallas_hist.pick_segment_chunk(
                    np.bincount(seg, minlength=self.nsignals))
                self._seg_chunk = autotune.tuned_chunk(
                    "segmented", self.total_nbins, self.nsignals,
                    int(self.samples_host.shape[0]), heuristic)
                packed, chunk_seg = pallas_hist.pack_samples_per_segment(
                    np.concatenate(sample_arrays, axis=0), lower, seg,
                    self.nsignals, chunk=self._seg_chunk,
                    weights=self.sample_weights_host)
                self._packed = jnp.asarray(packed)
                self._chunk_seg = chunk_seg  # host numpy (embeds in jit)
                rows = []
                systs = []
                for ms in self.systematics:
                    if all(ms.signal_mask):
                        systs.append((ms.desc, None))
                    else:
                        systs.append((ms.desc, len(rows)))
                        rows.append([int(b) for b in ms.signal_mask])
                self._pallas_systs = tuple(systs)
                self._mask_matrix = (
                    np.asarray(rows, np.int32) if rows
                    else np.ones((1, self.nsignals), np.int32))
            else:
                self._packed = jnp.asarray(pallas_hist.pack_samples(
                    np.concatenate(sample_arrays, axis=0),
                    lower, segment_ids=seg,
                    weights=self.sample_weights_host))
                self._pallas_systs = tuple(
                    (ms.desc,
                     None if all(ms.signal_mask) else
                     tuple(int(b) for b in ms.signal_mask))
                    for ms in self.systematics)

        self._read_bins = None  # (nsignals, nevents) after set_data

    # ------------------------------------------------------------------

    def set_data(self, data: np.ndarray) -> None:
        """Precompute per-signal read bins for the dataset.

        ``data`` is ``(nevents, nobservables + 1)`` with the dataset tag
        last.  Data points never move under systematics, so this runs
        once per dataset (reference: pdfz.cpp:245-302, mcmc.cpp:231-242).
        """
        self._read_bins = self.compute_read_bins(
            np.asarray(data, np.float32))

    @property
    def nevents(self) -> int:
        if self._read_bins is None:
            raise RuntimeError("set_data() must be called first")
        return self._read_bins.shape[1]

    # ------------------------------------------------------------------

    @property
    def device_data(self):
        """The MC-sample device arrays, to be passed as jit ARGUMENTS.

        Capturing these as closure constants inside jit both re-ships
        them per call and degrades dispatch latency on tunneled
        backends — every jitted entry point threads them explicitly.
        """
        kde_arrays = tuple(kde.samples for _, kde in self._kde)
        if self.use_pallas:
            return (self._packed,) + kde_arrays
        if self.sample_weights is not None:
            return (self.samples, self.segment_ids,
                    self.sample_weights) + kde_arrays
        return (self.samples, self.segment_ids) + kde_arrays

    def histograms(self, theta_syst: jnp.ndarray, device_data=None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(nsignals, total_nbins) counts + (nsignals,) norms at theta."""
        theta_syst = jnp.asarray(theta_syst, jnp.float32)
        if device_data is None:
            device_data = self.device_data
        # KDE sample arrays ride at the tail of device_data (explicit
        # jit arguments, never closure constants).
        nkde = len(self._kde)
        kde_arrays = device_data[len(device_data) - nkde:] if nkde else ()
        device_data = device_data[:len(device_data) - nkde] if nkde \
            else device_data
        if self.use_pallas:
            from sxmc_tpu.ops import pallas_hist

            (packed,) = device_data
            if self._per_segment:
                flat = pallas_hist.pallas_histogram_segmented(
                    packed, self._chunk_seg, self._mask_matrix,
                    theta_syst,
                    nfields=self.samples.shape[1],
                    nobs=self.nobservables,
                    systematics=self._pallas_systs,
                    lower=self.lower_host, upper=self.upper_host,
                    nbins=self.nbins, nsegments=self.nsignals,
                    chunk=self._seg_chunk)
            else:
                flat = pallas_hist.pallas_histogram(
                    packed, theta_syst,
                    nfields=self.samples.shape[1],
                    nobs=self.nobservables,
                    systematics=self._pallas_systs,
                    lower=self.lower_host, upper=self.upper_host,
                    nbins=self.nbins, nsegments=self.nsignals,
                    has_weights=self.has_weights)
            hists = flat.reshape(self.nsignals, self.total_nbins)
            norms = hists.sum(axis=1)
        else:
            samples, segment_ids = device_data[0], device_data[1]
            weights = device_data[2] if len(device_data) > 2 else None
            hists, norms = _stack_histograms(
                samples, segment_ids, theta_syst,
                self.lower, self.upper, self.nbins, self.nsignals,
                self.systematics, weights)
        # KDE-backed rows: grid-evaluated pseudo-counts replace the
        # (empty) binned rows, same counts/norm contract.
        for (i, kde), arr in zip(self._kde, kde_arrays):
            cnt, nrm = kde.histogram(theta_syst, samples=arr)
            hists = hists.at[i].set(cnt)
            norms = norms.at[i].set(nrm)
        return hists, norms

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

    def evaluate(self, theta_syst: jnp.ndarray, read_bins=None,
                 device_data=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fused re-histogram + LUT build: theta -> (lut, norms).

        This is the inner loop of the MCMC when systematics float.
        """
        if read_bins is None:
            if self._read_bins is None:
                raise RuntimeError("set_data() must be called first")
            read_bins = self._read_bins
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
                bin_volume=self.bin_volume, chunk=chunk)[:, :nev]
            return lut, norms
        lut = jax.vmap(evalhist.eval_from_bins, in_axes=(0, 0, None, 0))(
            hists, norms, self.bin_volume, read_bins)
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
        if self.use_pallas and self._per_segment and not self.has_kde:
            from sxmc_tpu.ops import pallas_hist

            b1, b2, _ = pallas_hist._balanced_split(self.total_nbins)
            acc = thetas.shape[0] * self.nsignals * b1 * max(b2, 128) * 4
            if acc > (4 << 20):
                # Batched accumulator would not fit VMEM (huge toy
                # batches): fall back to vmapped single builds.
                return jax.vmap(
                    lambda t: self.histograms(t, device_data))(thetas)
            packed = device_data[0]
            flat = pallas_hist.pallas_histogram_segmented(
                packed, self._chunk_seg, self._mask_matrix, thetas,
                nfields=self.samples.shape[1], nobs=self.nobservables,
                systematics=self._pallas_systs,
                lower=self.lower_host, upper=self.upper_host,
                nbins=self.nbins, nsegments=self.nsignals,
                chunk=self._seg_chunk)
            hists = flat.reshape(thetas.shape[0], self.nsignals,
                                 self.total_nbins)
            return hists, hists.sum(axis=2)
        return jax.vmap(lambda t: self.histograms(t, device_data))(thetas)

    def evaluate_batch(self, thetas: jnp.ndarray, read_bins=None,
                       device_data=None
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched (lut, norms): thetas (nchains, nsyst) ->
        ((nchains, nsignals, nevents), (nchains, nsignals))."""
        if read_bins is None:
            if self._read_bins is None:
                raise RuntimeError("set_data() must be called first")
            read_bins = self._read_bins
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
                bin_volume=self.bin_volume, chunk=chunk)[:, :nev]
            return lut.reshape(nchains, self.nsignals, nev), norms
        lut = jax.vmap(
            lambda h, n: jax.vmap(
                evalhist.eval_from_bins, in_axes=(0, 0, None, 0))(
                    h, n, self.bin_volume, read_bins))(hists, norms)
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
