"""Fake-experiment generation.

Re-implements reference src/generator.{h,cpp}: for each signal, the
expected count is ``nexpected * efficiency`` at the nominal systematics,
Poisson-fluctuated, and events are drawn from the signal's binned PDF
(bin-categorical + uniform-within-bin, the semantics of ROOT
``TH1::GetRandom``, pdfz.cpp:817-922) with rejection against the
observable bounds; events are tagged with the signal's dataset id.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import numpy as np

from sxmc_tpu.signal import Observable, Signal, Systematic, nominal_params


def make_fake_dataset(
    key,
    signals: Sequence[Signal],
    systematics: Sequence[Systematic],
    observables: Sequence[Observable],
    poisson: bool = True,
    verbose: bool = False,
) -> np.ndarray:
    """Generate one fake dataset (reference: generator.cpp:9-48).

    Returns ``(nevents, nobservables + 1)`` float32 with dataset tags.
    """
    syst_vals = nominal_params(systematics)
    uppers = [o.upper for o in observables]
    lowers = [o.lower for o in observables]

    chunks: List[np.ndarray] = []
    keys = jax.random.split(key, max(len(signals), 1))
    for sig, k in zip(signals, keys):
        eff = sig.get_efficiency(systematics)
        nevents = sig.nexpected * eff
        events = sig.histogram.random_sample(
            k, nevents, syst_vals=syst_vals, uppers=uppers, lowers=lowers,
            poisson=poisson, dataset=sig.dataset)
        if verbose:
            print(f"make_fake_dataset: {sig.name}: {events.shape[0]} events "
                  f"({nevents} expected, efficiency = {eff})")
        chunks.append(events)

    if not chunks:
        return np.zeros((0, len(observables) + 1), np.float32)
    return np.concatenate(chunks, axis=0)
