"""Fused step kernel (ops.pallas_step): histogram -> LUT -> log-sum.

Interpret-mode equalities on CPU; the same kernel runs on hardware in
smoke_tpu.py (fused_step case).  Contract (module docstring of
ops/pallas_step.py): histogram and per-event density/mix/log values
bit-identical to the jnp path; the event-sum reduction differs only in
grouping, so the final compensated pair agrees with nll_pair to
~2^-48 relative.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sxmc_tpu.ops.nll import nll_pair
from sxmc_tpu.pdf.stack import PdfStack, force_pallas_interpret
from sxmc_tpu.signal import Observable, Signal, Source, Systematic


def _fixture(nbins=100, n_mc=40_000, nevents=3000, seed=3,
             second_dataset=False):
    rng = np.random.default_rng(seed)
    obs = Observable(name="energy", field="energy", bins=nbins,
                     lower=5.0, upper=15.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.05],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    sig_mc = rng.normal(10, 1, (n_mc, 1)).astype(np.float32)
    bkg_mc = rng.uniform(5, 15, (n_mc, 1)).astype(np.float32)
    src_s = Source(name="sig", index=0, mean=1.0)
    src_b = Source(name="bkg", index=1, mean=1.0, sigma=0.1)
    ds_b = 1 if second_dataset else 0
    sig = Signal.from_table("sig", "sig", sig_mc, ["energy"], 0, src_s,
                            1000.0, fields, [obs], [], [syst])
    bkg = Signal.from_table("bkg", "bkg", bkg_mc, ["energy"], ds_b,
                            src_b, 2000.0, fields, [obs], [], [])
    tags = np.zeros(nevents, np.float32)
    if second_dataset:
        # Half the events carry dataset 1's tag; sig rows go -2 there.
        tags[nevents // 2:] = 1.0
    data = np.stack([rng.uniform(4.5, 15.5, nevents).astype(np.float32),
                     tags], axis=1)
    return obs, syst, [src_s, src_b], [sig, bkg], data


def _build(obs, syst, signals):
    with force_pallas_interpret():
        stack = PdfStack(signals, [obs], [syst])
    assert stack.use_pallas and stack._per_segment
    assert stack.supports_fused
    return stack


def _static(sources, signals, stack, nsyst=1):
    from sxmc_tpu.ops.nll import NLLStatic

    npar = len(sources) + nsyst
    means = np.zeros(npar, np.float32)
    sigmas = np.zeros(npar, np.float32)
    for i, s in enumerate(sources):
        means[i], sigmas[i] = s.mean, s.sigma
    means[len(sources):] = 0.0
    sigmas[len(sources):] = 0.05
    return NLLStatic(
        nexpected=np.asarray([s.nexpected for s in signals], np.float32),
        n_mc=np.asarray([s.n_mc for s in signals], np.float32),
        source_id=np.asarray([s.source.index for s in signals],
                             np.int32),
        means=means, sigmas=sigmas, nsources=len(sources))


class TestFusedStep:
    def test_hist_matches_stack_and_nll_matches_pair(self):
        obs, syst, sources, signals, data = _fixture()
        stack = _build(obs, syst, signals)
        stack.set_data(data)
        st = _static(sources, signals, stack)
        rb = stack._read_bins
        dd = stack.device_data
        params = jnp.asarray([1.1, 0.9, 0.02], jnp.float32)

        f_hi, f_lo = stack.fused_nll_pair(params, rb, dd, st)
        lut, norms = stack.evaluate(params[2:], rb, dd)
        u_hi, u_lo = nll_pair(params, lut, norms, st)
        f = float(f_hi) + float(f_lo)
        u = float(u_hi) + float(u_lo)
        assert abs(f - u) < 1e-4 * max(abs(u), 1.0), (f, u)

        # The histogram the fused kernel built is BIT-identical to the
        # split path's, and the in-kernel finished NLL equals the
        # wrapper's.
        from sxmc_tpu.ops import pallas_step
        theta = params[2:]
        stack._fused_setup()
        b1, b2 = stack._fused_b1b2
        nev = rb.shape[-1]
        ev_chunk = pallas_step.pick_event_chunk(nev, 2, b1, b2)
        npad = -(-nev // ev_chunk) * ev_chunk
        rbp = jnp.pad(jnp.asarray(rb, jnp.int32),
                      ((0, 0), (0, npad - nev)),
                      constant_values=-2).reshape(2, npad // 128, 128)
        hist, ev, nll_out = pallas_step.pallas_fused_step(
            dd[0], stack._fused_chunk_seg, stack._fused_mask_matrix,
            jnp.asarray(stack._fused_hist_init), rbp, params,
            nfields=stack.nfields, nobs=1,
            systematics=stack._fused_systs, lower=stack.lower_host,
            upper=stack.upper_host, nbins=stack.nbins, nsignals=2,
            mc_chunk=stack._seg_chunk, ev_chunk=ev_chunk,
            n_mc=tuple(float(x) for x in np.asarray(stack.n_mc)),
            bin_volume=stack.bin_volume,
            nexpected=tuple(float(x) for x in st.nexpected),
            source_id=tuple(int(x) for x in st.source_id),
            means=tuple(float(x) for x in st.means),
            sigmas=tuple(float(x) for x in st.sigmas),
            nsources=int(st.nsources), interpret=True)
        assert float(nll_out[0]) == float(f_hi)
        assert float(nll_out[1]) == float(f_lo)
        got = np.asarray(hist).reshape(2, b1 * b2)[:, :stack.total_nbins]
        want, want_norms = stack.histograms(theta, dd)
        np.testing.assert_array_equal(got, np.asarray(want))

        # Event pairs match the jnp replica of the kernel's blocking to
        # ulp-scale.  (Not bitwise: XLA's FMA-contraction freedom means
        # two separately compiled programs may round the w*val mix one
        # ulp apart — measured 1-ulp diffs on ~6% of logs even between
        # two pure-jnp compilations.  The integer histogram above IS
        # bitwise; the compensated pair keeps the residual at the
        # ~1e-9-relative level, far below the dNLL ~ 0.5 scale.)
        from sxmc_tpu.ops.nll import signal_weights
        hists_full = jnp.asarray(got)
        w = signal_weights(params, want_norms, st)
        ref_hi, ref_lo = pallas_step.fused_reference_event_pairs(
            hists_full, want_norms, w, jnp.asarray(rb, jnp.int32),
            stack.bin_volume, ev_chunk)
        got_hi, got_lo = pallas_step.reduce_pairs(ev)
        d = abs((float(got_hi) + float(got_lo))
                - (float(ref_hi) + float(ref_lo)))
        assert d <= 2e-6 * max(abs(float(ref_hi)), 1.0), \
            (got_hi, got_lo, ref_hi, ref_lo)

    def test_sentinels_and_multidataset(self):
        obs, syst, sources, signals, data = _fixture(
            second_dataset=True)
        stack = _build(obs, syst, signals)
        stack.set_data(data)
        st = _static(sources, signals, stack)
        rb = stack._read_bins
        dd = stack.device_data
        params = jnp.asarray([0.8, 1.2, -0.03], jnp.float32)
        f_hi, f_lo = stack.fused_nll_pair(params, rb, dd, st)
        lut, norms = stack.evaluate(params[2:], rb, dd)
        u_hi, u_lo = nll_pair(params, lut, norms, st)
        f = float(f_hi) + float(f_lo)
        u = float(u_hi) + float(u_lo)
        assert abs(f - u) < 1e-4 * max(abs(u), 1.0), (f, u)

    def test_negative_rate_barrier(self):
        obs, syst, sources, signals, data = _fixture()
        stack = _build(obs, syst, signals)
        stack.set_data(data)
        st = _static(sources, signals, stack)
        params = jnp.asarray([-0.5, 1.0, 0.0], jnp.float32)
        f_hi, f_lo = stack.fused_nll_pair(
            params, stack._read_bins, stack.device_data, st)
        assert float(f_hi) == float(np.float32(1e18))
        assert float(f_lo) == 0.0

    def test_batched_matches_single(self):
        obs, syst, sources, signals, data = _fixture(nevents=700)
        stack = _build(obs, syst, signals)
        stack.set_data(data)
        st = _static(sources, signals, stack)
        rb = stack._read_bins
        dd = stack.device_data
        params = jnp.asarray(
            [[1.1, 0.9, 0.02], [0.7, 1.3, -0.04], [1.0, 1.0, 0.0]],
            jnp.float32)
        b_hi, b_lo = stack.fused_nll_pair(params, rb, dd, st)
        assert b_hi.shape == (3,)
        for c in range(3):
            s_hi, s_lo = stack.fused_nll_pair(params[c], rb, dd, st)
            assert float(b_hi[c]) == float(s_hi), (c, b_hi[c], s_hi)
            assert float(b_lo[c]) == float(s_lo), (c, b_lo[c], s_lo)

    def test_run_segment_fused_in_scan(self):
        """run_segment on a pallas (interpret) stack takes the fused
        path inside the scan: finite NLL history, healthy acceptance,
        deterministic, and consistent with the split-path NLL at the
        final state."""
        from sxmc_tpu.mcmc import metropolis
        from sxmc_tpu.mcmc.metropolis import MCMC

        obs, syst, sources, signals, data = _fixture(n_mc=20_000,
                                                     nevents=800)
        with force_pallas_interpret():
            mcmc = MCMC(sources, signals, [syst], [obs])
        assert mcmc.stack.supports_fused
        mcmc.stack.set_data(data)
        rb = mcmc.stack._read_bins
        dd = mcmc.stack.device_data
        assert metropolis._fused_ok(mcmc, rb)
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        key = jax.random.PRNGKey(7)
        pf, nf, samples, nlls, acc = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, key, 300)
        hist = np.asarray(nlls[0]) + np.asarray(nlls[1])
        assert np.isfinite(hist).all()
        assert 0.05 < float(acc) < 0.95, float(acc)
        # Determinism (same key -> bit-identical walk).
        pf2, nf2, samples2, _, _ = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, key, 300)
        np.testing.assert_array_equal(np.asarray(samples),
                                      np.asarray(samples2))
        # Final carried NLL agrees with the split path at the final
        # params.
        st = mcmc.static
        lut, norms = mcmc.stack.evaluate(pf[2:], rb, dd)
        u_hi, u_lo = nll_pair(pf, lut, norms, st)
        f = float(nf[0]) + float(nf[1])
        u = float(u_hi) + float(u_lo)
        assert abs(f - u) < 1e-4 * max(abs(u), 1.0), (f, u)

    def test_batched_runner_fused(self):
        """_run_chains_batched on a pallas stack uses the batched fused
        kernel; the walk recovers rates on a simple fixture."""
        from sxmc_tpu.mcmc import metropolis
        from sxmc_tpu.mcmc.metropolis import MCMC

        obs, syst, sources, signals, data = _fixture(n_mc=20_000,
                                                     nevents=800)
        with force_pallas_interpret():
            mcmc = MCMC(sources, signals, [syst], [obs])
        mcmc.stack.set_data(data)
        keys = jax.random.split(jax.random.PRNGKey(3), 3)
        samples, nlls, acc = metropolis._run_chains_batched(
            mcmc, keys, mcmc.stack._read_bins, mcmc.stack.device_data,
            200, 50, False)
        hist = np.asarray(nlls[0]) + np.asarray(nlls[1])
        assert np.isfinite(hist).all()
        assert samples.shape[0] == 3

    def test_kde_falls_back(self):
        """KDE stacks must refuse the fused path (their density lives
        off the bin grid)."""
        rng = np.random.default_rng(5)
        obs = Observable(name="x", field="x", bins=10, lower=0.0,
                         upper=1.0, field_index=0)
        syst = Systematic(name="sh", type=0, observable_field="x",
                          means=[0.0], sigmas=[0.1],
                          observable_field_index=0, pidx=[0])
        fields = ["x", "DATASET"]
        mc = rng.uniform(0, 1, (1000, 1)).astype(np.float32)
        src = Source(name="s", index=0)
        s = Signal.from_table(
            "s", "s", mc, ["x"], 0, src, 10.0, fields, [obs], [],
            [syst], kde=True)
        with force_pallas_interpret():
            stack = PdfStack([s], [obs], [syst])
        assert not stack.supports_fused
        with pytest.raises(NotImplementedError):
            stack.fused_nll_pair(jnp.ones(2), None, None, None)


def _weighted_fixture(dyn_weighted, static_weighted, nbins=100,
                      n_mc=30_000, nevents=2000, seed=13):
    """2-signal mix: sig is dynamic (shift systematic), bkg static."""
    rng = np.random.default_rng(seed)
    obs = Observable(name="energy", field="energy", bins=nbins,
                     lower=5.0, upper=15.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.05],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    sig_mc = rng.normal(10, 1, (n_mc, 1)).astype(np.float32)
    bkg_mc = rng.uniform(5, 15, (n_mc, 1)).astype(np.float32)
    src_s = Source(name="sig", index=0, mean=1.0)
    src_b = Source(name="bkg", index=1, mean=1.0, sigma=0.1)
    sig = Signal.from_table("sig", "sig", sig_mc, ["energy"], 0,
                            src_s, 1000.0, fields, [obs], [], [syst])
    bkg = Signal.from_table("bkg", "bkg", bkg_mc, ["energy"], 0,
                            src_b, 2000.0, fields, [obs], [], [])
    if dyn_weighted:
        sig.histogram.weights = rng.uniform(
            0.5, 2.0, n_mc).astype(np.float32)
    if static_weighted:
        bkg.histogram.weights = rng.uniform(
            0.2, 3.0, n_mc).astype(np.float32)
    data = np.stack([rng.uniform(4.5, 15.5, nevents).astype(np.float32),
                     np.zeros(nevents, np.float32)], axis=1)
    return obs, syst, [src_s, src_b], [sig, bkg], data


class TestWeightedFused:
    """Weighted MC through the fused kernels (r5): histogram values
    stay bit-identical to the split path; norms come from the
    in-kernel compensated accumulator, so the NLL agrees to norm-ulp
    scale rather than bit-exactly."""

    @pytest.mark.parametrize("dyn_w,stat_w",
                             [(True, False), (False, True),
                              (True, True)])
    def test_matches_split_path(self, dyn_w, stat_w):
        obs, syst, sources, signals, data = _weighted_fixture(
            dyn_w, stat_w)
        stack = _build(obs, syst, signals)
        assert stack.has_weights and stack.supports_fused
        stack.set_data(data)
        st = _static(sources, signals, stack)
        rb = stack._read_bins
        dd = stack.device_data
        params = jnp.asarray([1.02, 0.95, 0.013], jnp.float32)
        theta = params[2:]

        from sxmc_tpu.ops import pallas_step
        from sxmc_tpu.ops.pallas_hist import LANES, _balanced_split

        stack._fused_setup()
        b1, b2 = stack._fused_b1b2
        nev = rb.shape[-1]
        ev_chunk = pallas_step.pick_event_chunk(nev, 2, b1, b2)
        npad = -(-nev // ev_chunk) * ev_chunk
        rbp = jnp.pad(rb, ((0, 0), (0, npad - nev)),
                      constant_values=-2).reshape(2, npad // LANES,
                                                  LANES)
        hist, _, nll_f = pallas_step.pallas_fused_step(
            dd[0], stack._fused_chunk_seg, stack._fused_mask_matrix,
            jnp.asarray(stack._fused_hist_init), rbp, params,
            norm_init=stack._fused_norm_init,
            nfields=stack.nfields, nobs=1,
            systematics=stack._fused_systs,
            lower=stack.lower_host, upper=stack.upper_host,
            nbins=stack.nbins, nsignals=2,
            mc_chunk=stack._seg_chunk, ev_chunk=ev_chunk,
            n_mc=tuple(float(x) for x in np.asarray(stack.n_mc)),
            bin_volume=stack.bin_volume,
            nexpected=tuple(float(x) for x in st.nexpected),
            source_id=tuple(int(x) for x in st.source_id),
            means=tuple(float(x) for x in st.means),
            sigmas=tuple(float(x) for x in st.sigmas),
            nsources=2, interpret=True)

        # Histogram bin values: bit-identical to the split path.
        want_h, want_norms = stack.histograms(theta, dd)
        total = stack.total_nbins
        got_h = np.asarray(hist).reshape(2, -1)[:, :total]
        np.testing.assert_array_equal(got_h, np.asarray(want_h))

        # NLL: the compensated chunk-pair norm differs from
        # hists.sum() only in f32 association -> norm-ulp agreement.
        lut, norms = stack.evaluate(theta, rb, dd)
        hi, lo = nll_pair(params, lut, norms, st)
        want = float(hi) + float(lo)
        got = float(nll_f[0]) + float(nll_f[1])
        assert abs(got - want) < 0.02, (got, want)

        # And through the PdfStack entry point.
        hi2, lo2 = stack.fused_nll_pair(params, rb, dd, st)
        assert float(hi2) + float(lo2) == got

    def test_weighted_segment_trajectory(self):
        """Weighted whole-segment kernel: trajectory equals a
        step-by-step drive of the weighted one-shot kernel (both use
        the compensated norms -> bit-comparable)."""
        from sxmc_tpu.mcmc import metropolis
        from sxmc_tpu.mcmc.metropolis import MCMC

        obs, syst, sources, signals, data = _weighted_fixture(
            True, True, n_mc=20_000, nevents=800)
        with force_pallas_interpret():
            mcmc = MCMC(sources, signals, [syst], [obs])
        assert mcmc.stack.supports_fused
        mcmc.stack.set_data(data)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        key = jax.random.PRNGKey(7)
        nsteps = 16
        pf, nf, samples, nlls, acc = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, key, nsteps)

        from test_fused_segment import _reference_walk
        ref_s, ref_a, ref_n = _reference_walk(mcmc, p0, nll0, w0, key,
                                              nsteps)
        np.testing.assert_allclose(np.asarray(samples), ref_s,
                                   rtol=3e-7, atol=3e-7)
        got_n = np.asarray(nlls[0]) + np.asarray(nlls[1])
        np.testing.assert_allclose(got_n, ref_n, rtol=1e-6)
