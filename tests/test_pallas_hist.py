"""Equivalence tests: Pallas fused histogram vs the jnp reference path.

Runs the kernel in interpreter mode on CPU; on TPU the same kernel is
the production hot path (sxmc_tpu/ops/pallas_hist.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sxmc_tpu.ops import histogram as hist_ops
from sxmc_tpu.ops import pallas_hist
from sxmc_tpu.ops.transforms import (
    RESOLUTION_SCALE, SCALE, SHIFT, SystematicDesc, apply_systematics)

CHUNK = 1024


def jnp_reference(samples, theta, systs, lower, upper, nbins, total):
    transformed = apply_systematics(jnp.asarray(samples), theta, systs)
    ids, valid = hist_ops.compute_bin_ids(
        transformed[:, :len(nbins)], jnp.asarray(lower), jnp.asarray(upper),
        nbins)
    return hist_ops.fixed_bincount(ids, valid.astype(jnp.float32), total)


class TestPallasEquivalence:
    def test_2d_with_systematics(self):
        rng = np.random.default_rng(3)
        n = 5000
        samples = np.stack([
            rng.normal(0.5, 0.2, n), rng.uniform(0, 1, n)],
            axis=1).astype(np.float32)
        lower, upper, nbins = (0.0, 0.0), (1.0, 1.0), (10, 7)
        theta = jnp.array([0.03, -0.05], jnp.float32)
        systs = (SystematicDesc(SHIFT, obs=0, par_indices=(0,)),
                 SystematicDesc(SCALE, obs=1, par_indices=(1,)))

        ref = jnp_reference(samples, theta, systs, lower, upper, nbins, 70)
        packed = pallas_hist.pack_samples(samples, lower, chunk=CHUNK)
        got = pallas_hist.pallas_histogram(
            jnp.asarray(packed), theta, nfields=2, nobs=2,
            systematics=tuple((d, None) for d in systs),
            lower=lower, upper=upper, nbins=nbins, chunk=CHUNK,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_resolution_scale_truth_field(self):
        rng = np.random.default_rng(5)
        n = 2000
        samples = np.stack([
            rng.normal(0.5, 0.2, n), rng.normal(0.5, 0.1, n)],
            axis=1).astype(np.float32)
        lower, upper, nbins = (0.0,), (1.0,), (8,)
        theta = jnp.array([0.25], jnp.float32)
        systs = (SystematicDesc(RESOLUTION_SCALE, obs=0, par_indices=(0,),
                                extra_field=1),)
        ref = jnp_reference(samples, theta, systs, lower, upper, nbins, 8)
        packed = pallas_hist.pack_samples(samples, lower, chunk=CHUNK)
        got = pallas_hist.pallas_histogram(
            jnp.asarray(packed), theta, nfields=2, nobs=1,
            systematics=tuple((d, None) for d in systs),
            lower=lower, upper=upper, nbins=nbins, chunk=CHUNK,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_segmented_with_masks(self):
        rng = np.random.default_rng(7)
        n = 3000
        samples = np.stack([
            rng.normal(0.5, 0.2, n), rng.uniform(0, 1, n)],
            axis=1).astype(np.float32)
        seg = rng.integers(0, 3, n).astype(np.float32)
        lower, upper, nbins = (0.0, 0.0), (1.0, 1.0), (10, 7)
        theta = jnp.array([0.03, -0.05], jnp.float32)
        systs = (SystematicDesc(SHIFT, obs=0, par_indices=(0,)),
                 SystematicDesc(SCALE, obs=1, par_indices=(1,)))

        packed = pallas_hist.pack_samples(samples, lower, segment_ids=seg,
                                          chunk=CHUNK)
        got = pallas_hist.pallas_histogram(
            jnp.asarray(packed), theta, nfields=2, nobs=2,
            systematics=((systs[0], (1, 0, 1)), (systs[1], None)),
            lower=lower, upper=upper, nbins=nbins, nsegments=3,
            chunk=CHUNK, interpret=True)

        refs = []
        for s in range(3):
            sel = seg == s
            active = list(systs) if s != 1 else [systs[1]]
            refs.append(jnp_reference(samples[sel], theta, active, lower,
                                      upper, nbins, 70))
        np.testing.assert_array_equal(
            np.asarray(jnp.concatenate(refs)), np.asarray(got))

    def test_padding_is_invisible(self):
        # 77 samples with chunk 1024: padding must not contribute.
        rng = np.random.default_rng(9)
        samples = rng.uniform(0, 1, (77, 1)).astype(np.float32)
        packed = pallas_hist.pack_samples(samples, (0.0,), chunk=CHUNK)
        got = pallas_hist.pallas_histogram(
            jnp.asarray(packed), jnp.zeros(1), nfields=1, nobs=1,
            systematics=(), lower=(0.0,), upper=(1.0,), nbins=(4,),
            chunk=CHUNK, interpret=True)
        assert float(got.sum()) == 77
