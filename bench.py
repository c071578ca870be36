"""Headline benchmark: pdfz-equivalent histogramming throughput.

Mirrors the reference benchmark ``bench_sxmc pdfz``
(reference: bench/bench_sxmc.cpp:34-102): 10M Gaussian samples, 100k
evaluation points, 1000 bins, one shift systematic; repeated full PDF
evaluations (re-histogram + evaluate at the data points) with a
synchronize per repetition, exactly like the reference's
EvalAsync+EvalFinished loop.  Metric = samples histogrammed per second.
Baseline: 2.99546e9 samples/s on an NVIDIA Tesla K40, the best published
reference number (README.md:322).

The device arrays are passed as jit arguments (never closure constants:
captured constants are re-uploaded per call on tunneled backends).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np

BASELINE_K40 = 2.99546e9  # samples/s, reference README.md:322

NSAMPLES = 10_000_000
NEVAL = 100_000
NBINS = 1000
NREPS = 100


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc
    from sxmc_tpu.pdf.evalhist import EvalHist, eval_from_bins

    rng = np.random.default_rng(20230817)
    # Gaussian at 0.5, sigma 0.15 on [0, 1) — bench_sxmc.cpp:54-57.
    samples = rng.normal(0.5, 0.15, (NSAMPLES, 1)).astype(np.float32)
    eval_points = np.stack([
        rng.uniform(0.0, 1.0, NEVAL).astype(np.float32),
        np.zeros(NEVAL, np.float32)], axis=1)

    ev = EvalHist(samples, 1, 1, [0.0], [1.0], [NBINS])
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    ev.add_systematic(syst)
    read_bins = ev.compute_read_bins(eval_points)

    if ev.use_pallas:
        from sxmc_tpu.ops import pallas_hist

        packed = jnp.asarray(pallas_hist.pack_samples(samples, [0.0]))

        @jax.jit
        def full_eval(packed, read_bins, params):
            bins = pallas_hist.pallas_histogram(
                packed, params, nfields=1, nobs=1,
                systematics=((syst, None),),
                lower=(0.0,), upper=(1.0,), nbins=(NBINS,))
            norm = bins.sum()
            return eval_from_bins(bins, norm, ev.bin_volume, read_bins), norm
    else:
        from sxmc_tpu.ops import histogram as hist_ops
        from sxmc_tpu.ops import transforms

        packed = jnp.asarray(samples)

        @jax.jit
        def full_eval(packed, read_bins, params):
            t = transforms.apply_systematics(packed, params, (syst,))
            ids, valid = hist_ops.compute_bin_ids(
                t[:, :1], ev.lower, ev.upper, (NBINS,))
            bins = hist_ops.fixed_bincount(
                ids, valid.astype(jnp.float32), NBINS)
            norm = bins.sum()
            return eval_from_bins(bins, norm, ev.bin_volume, read_bins), norm

    thetas = [jnp.zeros((1,), jnp.float32).at[0].set(1e-6 * i)
              for i in range(NREPS)]

    # Warm up / compile.  NOTE: no host readback of values before the
    # timed loop — on tunneled backends the first device-to-host value
    # transfer permanently downgrades the client to a synchronous
    # ~27 ms-per-dispatch mode.  Correctness is asserted after timing.
    values, norm = full_eval(packed, read_bins, thetas[0])
    values.block_until_ready()

    # Timed region (bench_sxmc.cpp:77-101): one synchronize per rep, a
    # distinct systematic value per rep so no work can be elided.
    t0 = time.perf_counter()
    for th in thetas:
        out = full_eval(packed, read_bins, th)
        out[0].block_until_ready()
    elapsed = time.perf_counter() - t0

    assert float(norm) > 0.99 * NSAMPLES

    rate = NSAMPLES * NREPS / elapsed
    print(json.dumps({
        "metric": "pdfz_samples_histogrammed_per_sec",
        "value": rate,
        "unit": "samples/s",
        "vs_baseline": rate / BASELINE_K40,
    }))
    print(f"# elapsed {elapsed:.3f}s for {NREPS} reps of {NSAMPLES} "
          f"samples on {jax.devices()[0].device_kind} "
          f"(pallas={ev.use_pallas})", file=sys.stderr)


if __name__ == "__main__":
    main()
