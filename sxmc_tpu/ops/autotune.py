"""Offline autotuner for the Pallas histogram kernels.

The reference brute-forces CUDA launch configurations at runtime
(reference: EvalHist::Optimize{,Bin,Eval}, pdfz.cpp:622-814).  On TPU
the only free parameter is the sample-chunk size per grid step; XLA and
Mosaic handle the rest.  This harness sweeps chunk sizes with the
slope-timing methodology (see bench.py) and reports the best — run it
offline, not inside fits.
"""

from __future__ import annotations

import time
from typing import Dict, Sequence, Tuple

import numpy as np


def _timed_value(fn, *args) -> float:
    t0 = time.perf_counter()
    v = fn(*args)
    float(np.asarray(v).ravel()[0])
    return time.perf_counter() - t0


def tune_histogram_chunk(
    nsamples: int = 1_000_000,
    nbins: Tuple[int, ...] = (1000,),
    chunks: Sequence[int] = (16384, 32768, 65536, 131072),
    reps: Tuple[int, int] = (20, 100),
    seed: int = 0,
) -> Dict[int, float]:
    """Measure per-rebuild seconds for each chunk size; returns
    {chunk: seconds}.  Pick ``min(result, key=result.get)``."""
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist

    rng = np.random.default_rng(seed)
    samples = rng.normal(0.5, 0.15, (nsamples, 1)).astype(np.float32)

    results: Dict[int, float] = {}
    for chunk in chunks:
        packed = jnp.asarray(
            pallas_hist.pack_samples(samples, [0.0], chunk=chunk))

        def make(nreps, chunk=chunk):
            @jax.jit
            def f(packed):
                def body(i, acc):
                    theta = jnp.zeros((0,), jnp.float32)
                    bins = pallas_hist.pallas_histogram(
                        packed, theta, nfields=1, nobs=1,
                        systematics=(), lower=(0.0,), upper=(1.0,),
                        nbins=nbins, chunk=chunk)
                    return acc + bins[0] + jnp.float32(i)
                return jax.lax.fori_loop(0, nreps, body, jnp.float32(0))
            return f

        lo, hi = reps
        f_lo, f_hi = make(lo), make(hi)
        t_lo = min(_timed_value(f_lo, packed) for _ in range(2))
        t_hi = min(_timed_value(f_hi, packed) for _ in range(2))
        results[chunk] = max(t_hi - t_lo, 1e-9) / (hi - lo)
    return results


def main():
    import json

    res = tune_histogram_chunk()
    best = min(res, key=res.get)
    print(json.dumps({
        "chunk_seconds": {str(k): v for k, v in res.items()},
        "best_chunk": best,
    }))


if __name__ == "__main__":
    main()
