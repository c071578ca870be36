"""Fake-experiment generation.

Re-implements reference src/generator.{h,cpp}: for each signal, the
expected count is ``nexpected * efficiency`` at the nominal systematics,
Poisson-fluctuated, and events are drawn from the signal's binned PDF
(bin-categorical + uniform-within-bin, the semantics of ROOT
``TH1::GetRandom``, pdfz.cpp:817-922) with rejection against the
observable bounds; events are tagged with the signal's dataset id.

All signals' histograms are built by ONE batched PdfStack evaluation —
per-signal kernel builds would pay one compile per distinct MC size.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np

from sxmc_tpu.ops import histogram as hist_ops
from sxmc_tpu.signal import Observable, Signal, Systematic, nominal_params


def sample_from_counts(
    key,
    counts: np.ndarray,
    nbins: Sequence[int],
    lower: Sequence[float],
    upper: Sequence[float],
    nexpected: float,
    uppers=None,
    lowers=None,
    poisson: bool = False,
    dataset: float = 0.0,
) -> np.ndarray:
    """Draw events from histogram counts (TH1::GetRandom semantics).

    Categorical over bins by content, uniform within a bin; bins outside
    the optional [lowers, uppers] bounds are excluded up front (the
    host-loop equivalent of the reference's rejection loop,
    pdfz.cpp:853-914).  Returns ``(n, nobs + 1)`` float32 with the
    dataset tag last.
    """
    nobs = len(nbins)
    counts = np.asarray(counts, np.float64).reshape(-1)
    strides = hist_ops.bin_strides(nbins)
    lower = np.asarray(lower, np.float64)
    upper = np.asarray(upper, np.float64)
    widths = (upper - lower) / np.asarray(nbins, np.float64)

    key_n, key_bin, key_pos = jax.random.split(jax.numpy.asarray(key), 3)
    if poisson:
        nobserved = int(jax.random.poisson(key_n, nexpected))
    else:
        nobserved = int(np.floor(nexpected + 0.5))  # nint (utils.h)
    if nobserved == 0:
        return np.zeros((0, nobs + 1), np.float32)

    probs = counts.copy()
    if uppers is not None and len(np.atleast_1d(uppers)):
        uppers = np.atleast_1d(np.asarray(uppers, np.float64))
        lowers = np.atleast_1d(np.asarray(lowers, np.float64))
        flat = np.arange(probs.shape[0])
        ok = np.ones(probs.shape[0], bool)
        for i, (st, nb) in enumerate(zip(strides, nbins)):
            axis_idx = (flat // st) % nb
            lo_edge = lower[i] + axis_idx * widths[i]
            hi_edge = lo_edge + widths[i]
            ok &= (hi_edge > lowers[i]) & (lo_edge < uppers[i])
        probs = np.where(ok, probs, 0.0)
    total = probs.sum()
    if total <= 0:
        return np.zeros((0, nobs + 1), np.float32)
    probs = probs / total

    bin_idx = np.asarray(jax.random.choice(
        key_bin, probs.shape[0], shape=(nobserved,),
        p=jax.numpy.asarray(probs)))
    u = np.asarray(jax.random.uniform(
        key_pos, (nobserved, nobs)), np.float64)

    events = np.empty((nobserved, nobs + 1), np.float32)
    for i, (st, nb) in enumerate(zip(strides, nbins)):
        axis_idx = (bin_idx // st) % nb
        events[:, i] = lower[i] + (axis_idx + u[:, i]) * widths[i]
    events[:, nobs] = float(dataset)
    return events


def make_fake_dataset(
    key,
    signals: Sequence[Signal],
    systematics: Sequence[Systematic],
    observables: Sequence[Observable],
    poisson: bool = True,
    verbose: bool = False,
    stack=None,
) -> np.ndarray:
    """Generate one fake dataset (reference: generator.cpp:9-48).

    Returns ``(nevents, nobservables + 1)`` float32 with dataset tags.
    Pass the fit's PdfStack as ``stack`` to reuse its compiled kernels.
    """
    if not signals:
        return np.zeros((0, len(observables) + 1), np.float32)

    if stack is None:
        from sxmc_tpu.pdf.stack import PdfStack

        stack = PdfStack(signals, observables, systematics)

    theta = nominal_params(systematics)
    hists, norms = stack.histograms(theta)
    hists = np.asarray(hists)
    norms = np.asarray(norms)

    uppers = [o.upper for o in observables]
    lowers = [o.lower for o in observables]

    chunks: List[np.ndarray] = []
    keys = jax.random.split(key, len(signals))
    for i, (sig, k) in enumerate(zip(signals, keys)):
        eff = float(norms[i]) / sig.n_mc
        nevents = sig.nexpected * eff
        events = sample_from_counts(
            k, hists[i], stack.nbins, stack.lower_host, stack.upper_host,
            nevents, uppers=uppers, lowers=lowers, poisson=poisson,
            dataset=sig.dataset)
        if verbose:
            print(f"make_fake_dataset: {sig.name}: {events.shape[0]} "
                  f"events ({nevents} expected, efficiency = {eff})")
        chunks.append(events)

    return np.concatenate(chunks, axis=0)
