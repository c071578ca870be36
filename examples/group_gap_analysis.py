"""Measure where pdfz_group's gap to the one-hot floor goes.

VERDICT r4 item 6: the 29-signal group build measured 1.71e10
samples/s against the 2.2e10 single-PDF one-hot floor (CLAUDE.md rule
6).  This sweep decomposes the ~22% on hardware:

  A. floor        — single-PDF kernel at the group's total size,
                    chunk 65536 (the roofline configuration);
  B. uniform-29   — per-segment kernel, 29 EQUAL segments (isolates
                    per-segment overhead: smaller chunks + the
                    (nseg, b1, b2) accumulator routing, ~no padding);
  C. bench mix    — the ragged log-uniform mix, chunk sweep (adds the
                    real padding waste per chunk choice).

For each case both the EFFECTIVE rate (real samples / time) and the
PROCESSED rate (padded rows / time) print: their ratio is exactly the
padding waste, and processed-vs-floor is the pure kernel overhead.

Run on the TPU (single process):  python examples/group_gap_analysis.py
"""

import json
import os
import sys

import numpy as np

# Runnable as `python examples/group_gap_analysis.py` from anywhere:
# bench.py and sxmc_tpu live at the repo root.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _measure_segmented(samples, seg, nsegments, chunk, reps=(20, 120)):
    import jax
    import jax.numpy as jnp

    import bench
    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    packed_np, chunk_seg = pallas_hist.pack_samples_per_segment(
        samples, [0.0], seg, nsegments, chunk=chunk)
    packed = jnp.asarray(packed_np)
    mask = np.ones((1, nsegments), np.int32)
    npad = packed_np.shape[1] * 128

    def make(nreps):
        @jax.jit
        def f(packed):
            def body(i, acc):
                theta = jnp.full((1,), 1e-6 * i, jnp.float32)
                bins = pallas_hist.pallas_histogram_segmented(
                    packed, chunk_seg, mask, theta, nfields=1, nobs=1,
                    systematics=((syst, None),), lower=(0.0,),
                    upper=(1.0,), nbins=(1000,), nsegments=nsegments,
                    chunk=chunk)
                return acc + bins[0] + bins.sum()
            return jax.lax.fori_loop(0, nreps, body, jnp.float32(0))
        return f

    lo, hi = reps
    per_rep = bench._slope(make(lo), make(hi), lo, hi, (packed,))
    return per_rep, npad


def _measure_single(samples, chunk, reps=(20, 120)):
    import jax
    import jax.numpy as jnp

    import bench
    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    packed_np = pallas_hist.pack_samples(samples, [0.0], chunk=chunk)
    packed = jnp.asarray(packed_np)
    npad = packed_np.shape[1] * 128

    def make(nreps):
        @jax.jit
        def f(packed):
            def body(i, acc):
                theta = jnp.full((1,), 1e-6 * i, jnp.float32)
                bins = pallas_hist.pallas_histogram(
                    packed, theta, nfields=1, nobs=1,
                    systematics=((syst, None),), lower=(0.0,),
                    upper=(1.0,), nbins=(1000,), chunk=chunk)
                return acc + bins[0]
            return jax.lax.fori_loop(0, nreps, body, jnp.float32(0))
        return f

    lo, hi = reps
    per_rep = bench._slope(make(lo), make(hi), lo, hi, (packed,))
    return per_rep, npad


def main():
    rng = np.random.default_rng(29)
    nsignals = 29
    raw = np.exp(rng.uniform(np.log(1e3), np.log(3e6), nsignals))
    counts = np.maximum((raw * (4.9e6 / raw.sum())).astype(int), 100)
    total = int(counts.sum())
    samples = rng.normal(0.5, 0.2, (total, 1)).astype(np.float32)
    seg_mix = np.repeat(np.arange(nsignals), counts)
    seg_uniform = np.repeat(np.arange(nsignals),
                            [total // nsignals] * (nsignals - 1)
                            + [total - (total // nsignals)
                               * (nsignals - 1)])

    out = []

    # A. single-PDF floor at the group's total size.
    per_rep, npad = _measure_single(samples, 65536)
    out.append({"case": "floor_single_pdf", "chunk": 65536,
                "effective_sps": total / per_rep,
                "processed_sps": npad / per_rep,
                "padding_waste": npad / total - 1})

    # A'. single-PDF at the segmented chunk sizes (chunk-size cost
    # WITHOUT any segmentation).
    for chunk in (8192, 16384, 32768):
        per_rep, npad = _measure_single(samples, chunk)
        out.append({"case": "single_pdf", "chunk": chunk,
                    "effective_sps": total / per_rep,
                    "processed_sps": npad / per_rep,
                    "padding_waste": npad / total - 1})

    # B. uniform 29 segments (per-segment kernel overhead, ~no ragged
    # padding beyond per-segment round-up).
    for chunk in (8192, 16384, 32768, 65536):
        per_rep, npad = _measure_segmented(samples, seg_uniform,
                                           nsignals, chunk)
        out.append({"case": "uniform_29seg", "chunk": chunk,
                    "effective_sps": total / per_rep,
                    "processed_sps": npad / per_rep,
                    "padding_waste": npad / total - 1})

    # C. the ragged bench mix.
    for chunk in (8192, 16384, 32768, 65536):
        per_rep, npad = _measure_segmented(samples, seg_mix,
                                           nsignals, chunk)
        out.append({"case": "bench_mix_29seg", "chunk": chunk,
                    "effective_sps": total / per_rep,
                    "processed_sps": npad / per_rep,
                    "padding_waste": npad / total - 1})

    for o in out:
        print(json.dumps(o), flush=True)


if __name__ == "__main__":
    main()
