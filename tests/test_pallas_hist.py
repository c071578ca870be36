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


class TestWeightedPallas:
    """Weighted samples stay on the Pallas path (weights row)."""

    def test_weighted_matches_jnp(self):
        rng = np.random.default_rng(21)
        n = 4000
        samples = rng.normal(0.5, 0.2, (n, 1)).astype(np.float32)
        weights = rng.uniform(0.1, 3.0, n).astype(np.float32)
        theta = jnp.array([0.02], jnp.float32)
        systs = (SystematicDesc(SHIFT, obs=0, par_indices=(0,)),)
        lower, upper, nbins = (0.0,), (1.0,), (50,)

        transformed = apply_systematics(jnp.asarray(samples), theta,
                                        systs)
        ids, valid = hist_ops.compute_bin_ids(
            transformed[:, :1], jnp.asarray(lower), jnp.asarray(upper),
            nbins)
        ref = hist_ops.fixed_bincount(
            ids, valid.astype(jnp.float32) * weights, 50)

        packed = pallas_hist.pack_samples(samples, lower,
                                          weights=weights, chunk=CHUNK)
        got = pallas_hist.pallas_histogram(
            jnp.asarray(packed), theta, nfields=1, nobs=1,
            systematics=tuple((d, None) for d in systs),
            lower=lower, upper=upper, nbins=nbins, chunk=CHUNK,
            has_weights=True, interpret=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-6)

    def test_weighted_segmented(self):
        rng = np.random.default_rng(23)
        n = 3000
        samples = rng.uniform(0, 1, (n, 1)).astype(np.float32)
        weights = rng.uniform(0.5, 2.0, n).astype(np.float32)
        seg = np.sort(rng.integers(0, 3, n))
        packed, chunk_seg = pallas_hist.pack_samples_per_segment(
            samples, (0.0,), seg, 3, chunk=CHUNK, weights=weights)
        got = pallas_hist.pallas_histogram_segmented(
            jnp.asarray(packed), jnp.asarray(chunk_seg),
            jnp.ones((1, 3), jnp.int32), jnp.zeros(1), nfields=1,
            nobs=1, systematics=(), lower=(0.0,), upper=(1.0,),
            nbins=(8,), nsegments=3, chunk=CHUNK, interpret=True)
        got = np.asarray(got).reshape(3, 8)
        for s in range(3):
            sel = seg == s
            ref, _ = np.histogram(samples[sel, 0], bins=8,
                                  range=(0.0, 1.0), weights=weights[sel])
            np.testing.assert_allclose(ref, got[s], rtol=1e-6)


class TestPerSegmentKernel:
    """The per-segment variant (one signal per grid chunk)."""

    def _fixture(self, seed=7, n=3000, nseg=3):
        rng = np.random.default_rng(seed)
        samples = np.stack([
            rng.normal(0.5, 0.2, n), rng.uniform(0, 1, n)],
            axis=1).astype(np.float32)
        # Ragged segment sizes (sorted, as PdfStack concatenates).
        cuts = np.sort(rng.integers(1, n, nseg - 1))
        seg = np.zeros(n, np.int64)
        for c in cuts:
            seg[c:] += 1
        return samples, seg

    def test_matches_global_kernel(self):
        samples, seg = self._fixture()
        lower, upper, nbins = (0.0, 0.0), (1.0, 1.0), (10, 7)
        theta = jnp.array([0.03, -0.05], jnp.float32)
        systs = (SystematicDesc(SHIFT, obs=0, par_indices=(0,)),
                 SystematicDesc(SCALE, obs=1, par_indices=(1,)))

        packed, chunk_seg = pallas_hist.pack_samples_per_segment(
            samples, lower, seg, 3, chunk=CHUNK)
        mask = np.array([[1, 0, 1]], np.int32)  # syst 0 skips segment 1
        got = pallas_hist.pallas_histogram_segmented(
            jnp.asarray(packed), jnp.asarray(chunk_seg),
            jnp.asarray(mask), theta, nfields=2, nobs=2,
            systematics=((systs[0], 0), (systs[1], None)),
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

    def test_multi_chain_batched(self):
        samples, seg = self._fixture(seed=11, n=2000, nseg=2)
        lower, upper, nbins = (0.0, 0.0), (1.0, 1.0), (8, 5)
        thetas = jnp.array([[0.0, 0.0], [0.04, -0.1], [-0.02, 0.07]],
                           jnp.float32)
        systs = (SystematicDesc(SHIFT, obs=0, par_indices=(0,)),
                 SystematicDesc(SCALE, obs=1, par_indices=(1,)))

        packed, chunk_seg = pallas_hist.pack_samples_per_segment(
            samples, lower, seg, 2, chunk=CHUNK)
        mask = np.ones((1, 2), np.int32)
        got = pallas_hist.pallas_histogram_segmented(
            jnp.asarray(packed), jnp.asarray(chunk_seg),
            jnp.asarray(mask), thetas, nfields=2, nobs=2,
            systematics=tuple((d, None) for d in systs),
            lower=lower, upper=upper, nbins=nbins, nsegments=2,
            chunk=CHUNK, interpret=True)
        assert got.shape == (3, 2 * 40)

        for c in range(3):
            refs = []
            for s in range(2):
                sel = seg == s
                refs.append(jnp_reference(samples[sel], thetas[c], systs,
                                          lower, upper, nbins, 40))
            np.testing.assert_array_equal(
                np.asarray(jnp.concatenate(refs)), np.asarray(got[c]))

    def test_unsorted_input_and_padding(self):
        rng = np.random.default_rng(13)
        n = 700
        samples = rng.uniform(0, 1, (n, 1)).astype(np.float32)
        seg = rng.integers(0, 4, n)  # unsorted on purpose
        packed, chunk_seg = pallas_hist.pack_samples_per_segment(
            samples, (0.0,), seg, 4, chunk=CHUNK)
        got = pallas_hist.pallas_histogram_segmented(
            jnp.asarray(packed), jnp.asarray(chunk_seg),
            jnp.ones((1, 4), jnp.int32), jnp.zeros(1), nfields=1,
            nobs=1, systematics=(), lower=(0.0,), upper=(1.0,),
            nbins=(6,), nsegments=4, chunk=CHUNK, interpret=True)
        got = np.asarray(got).reshape(4, 6)
        for s in range(4):
            ref, _ = np.histogram(samples[seg == s, 0],
                                  bins=6, range=(0.0, 1.0))
            np.testing.assert_array_equal(ref, got[s])
