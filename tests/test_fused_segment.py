"""Whole-segment fused kernel (ops.pallas_step.pallas_fused_segment).

One Pallas launch runs an entire Metropolis segment: per-step proposal
from presampled noise, dynamic-histogram rebuild, compensated NLL, and
the log-space accept — params and NLL pair carried in SMEM scratch
across grid steps.  Contract: each proposal's NLL is the shared-body
math of ``pallas_fused_step`` (bit-identical), and the trajectory
equals a step-by-step drive of that one-shot kernel under the same
log-space accept rule (``log(u) <= delta``).

Interpret mode on CPU here; the same kernel runs on hardware in
smoke_tpu.py (fused_segment case).
"""

import numpy as np
import jax
import jax.numpy as jnp

from sxmc_tpu.mcmc import metropolis
from sxmc_tpu.mcmc.metropolis import MCMC
from sxmc_tpu.pdf.stack import force_pallas_interpret

from test_fused_step import _fixture


def _mcmc_fixture(**kw):
    obs, syst, sources, signals, data = _fixture(**kw)
    with force_pallas_interpret():
        mcmc = MCMC(sources, signals, [syst], [obs])
    assert mcmc.stack.supports_fused
    mcmc.stack.set_data(data)
    return mcmc


def _reference_walk(mcmc, p0, nll0, width, key, nsteps,
                    debug_mode=False):
    """Step-by-step drive of the ONE-SHOT fused kernel under the
    segment kernel's log-space accept rule, all-f32."""
    rb = mcmc.stack._read_bins
    dd = mcmc.stack.device_data
    noise, u = metropolis._presample(
        jax.random.split(key, nsteps), mcmc.nparameters, 0)
    log_u = np.log(np.asarray(u[:, 0], np.float32))
    params = np.asarray(p0, np.float32)
    cur = (np.float32(nll0[0]), np.float32(nll0[1]))
    w = np.asarray(width, np.float32)
    samples, accs, nll_hist = [], [], []
    for s in range(nsteps):
        nz = np.asarray(noise[s, 0], np.float32) * np.maximum(
            w, np.float32(0.0))
        prop = np.where(w > 0, (params + nz).astype(np.float32), params)
        hi, lo = mcmc.stack.fused_nll_pair(
            jnp.asarray(prop), rb, dd, mcmc.static)
        hi, lo = np.float32(hi), np.float32(lo)
        delta = np.float32(cur[0] - hi) + np.float32(cur[1] - lo)
        a = debug_mode or (delta > 0) or (log_u[s] <= delta)
        if a:
            params, cur = prop, (hi, lo)
        samples.append(params.copy())
        accs.append(float(a))
        nll_hist.append(cur[0] + cur[1])
    return np.stack(samples), np.asarray(accs), np.asarray(nll_hist)


class TestFusedSegment:
    def test_trajectory_matches_oneshot_reference(self):
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=800)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        key = jax.random.PRNGKey(7)
        nsteps = 24
        pf, nf, samples, nlls, acc = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, key, nsteps)
        ref_s, ref_a, ref_n = _reference_walk(mcmc, p0, nll0, w0, key,
                                              nsteps)
        got = np.asarray(samples)
        # Params agree to f32 ulp (the reference computes the proposal
        # in separately compiled ops; FMA-contraction freedom allows
        # 1-ulp differences, never trajectory divergence on this seed).
        np.testing.assert_allclose(got, ref_s, rtol=3e-7, atol=3e-7)
        got_n = np.asarray(nlls[0]) + np.asarray(nlls[1])
        np.testing.assert_allclose(got_n, ref_n, rtol=1e-6)
        assert abs(float(acc) - ref_a.mean()) < 1e-6
        np.testing.assert_allclose(np.asarray(pf), ref_s[-1],
                                   rtol=3e-7, atol=3e-7)

    def test_determinism_and_carry(self):
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=800)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        key = jax.random.PRNGKey(11)
        out1 = metropolis.run_segment(mcmc, p0, nll0, w0, rb, dd, key,
                                      16)
        out2 = metropolis.run_segment(mcmc, p0, nll0, w0, rb, dd, key,
                                      16)
        np.testing.assert_array_equal(np.asarray(out1[2]),
                                      np.asarray(out2[2]))
        # Segment chaining: the carry out of segment 1 seeds segment 2
        # exactly (the checkpoint/resume contract).
        pf, nf, _, _, _ = out1
        key2 = jax.random.PRNGKey(12)
        o_a = metropolis.run_segment(mcmc, pf, nf, w0, rb, dd, key2, 8)
        o_b = metropolis.run_segment(mcmc, pf, nf, w0, rb, dd, key2, 8)
        np.testing.assert_array_equal(np.asarray(o_a[2]),
                                      np.asarray(o_b[2]))

    def test_debug_mode_accepts_all(self):
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=400)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        _, _, _, _, acc = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, jax.random.PRNGKey(3), 12,
            debug_mode=True)
        assert float(acc) == 1.0

    def test_batched_matches_per_chain(self):
        """The batched segment kernel advances each lock-step chain
        exactly as a single-chain segment launch with the same
        presampled streams would."""
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=600)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        npar = mcmc.nparameters
        nch, nsteps = 3, 12
        rng = np.random.default_rng(8)
        noise = rng.normal(size=(nsteps, nch, npar)).astype(np.float32)
        log_u = np.log(rng.uniform(
            size=(nsteps, nch)).astype(np.float32))
        params0 = np.tile(np.asarray(p0, np.float32), (nch, 1))
        params0[1, 0] = 0.9
        params0[2, 1] = 1.1
        st = mcmc.static
        nll0_b = mcmc.stack.fused_nll_pair(
            jnp.asarray(params0), rb, dd, st)
        width = np.tile(np.asarray(w0, np.float32), (nch, 1))
        width[2] *= 0.5
        samples, nlls, accs = mcmc.stack.fused_segment(
            jnp.asarray(params0), nll0_b, jnp.asarray(width), rb, dd,
            jnp.asarray(noise), jnp.asarray(log_u), st)
        assert samples.shape == (nsteps, nch, npar)
        assert accs.shape == (nsteps, nch)
        for c in range(nch):
            s1, n1, a1 = mcmc.stack.fused_segment(
                jnp.asarray(params0[c]),
                (nll0_b[0][c], nll0_b[1][c]),
                jnp.asarray(width[c]), rb, dd,
                jnp.asarray(noise[:, c]), jnp.asarray(log_u[:, c]), st)
            np.testing.assert_allclose(
                np.asarray(samples[:, c]), np.asarray(s1),
                rtol=3e-7, atol=3e-7)
            np.testing.assert_array_equal(
                np.asarray(accs[:, c]), np.asarray(a1[:, 0]))

    def test_fullcov_trajectory(self):
        """run_segment_cov routes through the segment kernel's tril
        proposal branch; trajectory matches a step-by-step one-shot
        reference with the same sequential L @ z accumulation."""
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=600)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, _ = metropolis.initial_state(mcmc, rb, dd,
                                               allow_fused=True)
        npar = mcmc.nparameters
        tril = np.zeros((npar, npar), np.float32)
        tril[0, 0] = 0.04
        tril[1, 0], tril[1, 1] = -0.02, 0.03
        tril[2, 2] = 0.01
        key = jax.random.PRNGKey(17)
        nsteps = 16
        pf, nf, samples, nlls, acc = metropolis.run_segment_cov(
            mcmc, p0, nll0, jnp.asarray(tril), rb, dd, key, nsteps)

        noise, u = metropolis._presample(
            jax.random.split(key, nsteps), npar, 0)
        log_u = np.log(np.asarray(u[:, 0], np.float32))
        params = np.asarray(p0, np.float32)
        cur = (np.float32(nll0[0]), np.float32(nll0[1]))
        ref = []
        for s in range(nsteps):
            z = np.asarray(noise[s, 0], np.float32)
            prop = params.copy()
            for k in range(npar):
                a = np.float32(0.0)
                for j in range(k + 1):
                    a = np.float32(a + np.float32(tril[k, j] * z[j]))
                prop[k] = np.float32(params[k] + a)
            hi, lo = mcmc.stack.fused_nll_pair(
                jnp.asarray(prop), rb, dd, mcmc.static)
            hi, lo = np.float32(hi), np.float32(lo)
            delta = np.float32(cur[0] - hi) + np.float32(cur[1] - lo)
            if (delta > 0) or (log_u[s] <= delta):
                params, cur = prop, (hi, lo)
            ref.append(params.copy())
        ref = np.stack(ref)
        np.testing.assert_allclose(np.asarray(samples), ref,
                                   rtol=3e-7, atol=3e-7)
        # The zero row-2 structure never moves a parameter whose tril
        # row is zero... (row 2 is nonzero here; pin coverage is in
        # test_fixed_parameter_pinned for the diagonal branch.)
        assert 0.0 <= float(acc) <= 1.0

    def test_fixed_parameter_pinned(self):
        """width <= 0 pins a parameter exactly (the scan path's
        convention, metropolis._make_step)."""
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=400)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        w_pin = np.asarray(w0, np.float32).copy()
        w_pin[1] = -1.0
        _, _, samples, _, _ = metropolis.run_segment(
            mcmc, p0, nll0, jnp.asarray(w_pin), rb, dd,
            jax.random.PRNGKey(5), 16)
        col = np.asarray(samples)[:, 1]
        np.testing.assert_array_equal(col, np.full(16, float(p0[1]),
                                                   np.float32))


def _blocked_reference_walk(mcmc, p0, nll0, width, key, nsteps, m):
    """Step-by-step blocked-Gibbs drive of the one-shot fused kernel
    under the log-space accept: 1 systematic-block move + m rate-block
    moves per cycle, every NLL from fused_nll_pair (kernel math), so
    the whole-segment blocked kernel must match to f32-ulp scale."""
    rb = mcmc.stack._read_bins
    dd = mcmc.stack.device_data
    noise, u = metropolis._presample(
        jax.random.split(key, nsteps), mcmc.nparameters, m)
    log_u = np.log(np.asarray(u, np.float32))  # (nsteps, m+1)
    params = np.asarray(p0, np.float32)
    cur = (np.float32(nll0[0]), np.float32(nll0[1]))
    w = np.asarray(width, np.float32)
    rate_sel = np.arange(mcmc.nparameters) < mcmc.nsources
    samples, accs, nll_hist = [], [], []
    for s in range(nsteps):
        acc_n = 0.0
        for sub in range(m + 1):
            nz = np.asarray(noise[s, sub], np.float32) * np.maximum(
                w, np.float32(0.0))
            mask = rate_sel if sub > 0 else ~rate_sel
            prop = np.where((w > 0) & mask,
                            (params + nz).astype(np.float32), params)
            hi, lo = mcmc.stack.fused_nll_pair(
                jnp.asarray(prop), rb, dd, mcmc.static)
            hi, lo = np.float32(hi), np.float32(lo)
            delta = np.float32(cur[0] - hi) + np.float32(cur[1] - lo)
            if (delta > 0) or (log_u[s, sub] <= delta):
                params, cur = prop, (hi, lo)
                acc_n += 1.0
        samples.append(params.copy())
        accs.append(acc_n / (m + 1))
        nll_hist.append(cur[0] + cur[1])
    return np.stack(samples), np.asarray(accs), np.asarray(nll_hist)


class TestBlockedFusedSegment:
    """Blocked Metropolis-within-Gibbs inside the whole-segment kernel
    (r5): rate substeps reuse the carried current histogram in VMEM."""

    def test_trajectory_matches_oneshot_reference(self):
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=800)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        key = jax.random.PRNGKey(19)
        nsteps, m = 12, 3
        pf, nf, samples, nlls, acc = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, key, nsteps,
            rate_substeps=m)
        ref_s, ref_a, ref_n = _blocked_reference_walk(
            mcmc, p0, nll0, w0, key, nsteps, m)
        np.testing.assert_allclose(np.asarray(samples), ref_s,
                                   rtol=3e-7, atol=3e-7)
        got_n = np.asarray(nlls[0]) + np.asarray(nlls[1])
        np.testing.assert_allclose(got_n, ref_n, rtol=1e-6)
        assert abs(float(acc) - ref_a.mean()) < 1e-6
        np.testing.assert_allclose(np.asarray(pf), ref_s[-1],
                                   rtol=3e-7, atol=3e-7)

    def test_rate_moves_actually_move_rates_only(self):
        """Within a cycle the systematic coordinate changes at most
        once (the block structure), and rate moves leave it fixed."""
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=600)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        ref_s, _, _ = _blocked_reference_walk(
            mcmc, p0, nll0, w0, jax.random.PRNGKey(2), 10, 4)
        _, _, samples, _, acc = metropolis.run_segment(
            mcmc, p0, nll0, w0, rb, dd, jax.random.PRNGKey(2), 10,
            rate_substeps=4)
        np.testing.assert_allclose(np.asarray(samples), ref_s,
                                   rtol=3e-7, atol=3e-7)
        assert 0.0 < float(acc) <= 1.0

    def test_batched_matches_per_chain(self):
        mcmc = _mcmc_fixture(n_mc=20_000, nevents=600)
        rb, dd = mcmc.stack._read_bins, mcmc.stack.device_data
        p0, nll0, w0 = metropolis.initial_state(mcmc, rb, dd,
                                                allow_fused=True)
        npar = mcmc.nparameters
        nch, nsteps, m = 3, 8, 2
        rng = np.random.default_rng(8)
        noise = rng.normal(size=(nsteps, m + 1, nch, npar)).astype(
            np.float32)
        log_u = np.log(rng.uniform(
            size=(nsteps, m + 1, nch)).astype(np.float32))
        params0 = np.tile(np.asarray(p0, np.float32), (nch, 1))
        params0[1, 0] = 0.9
        params0[2, 1] = 1.1
        st = mcmc.static
        hi_b, lo_b = mcmc.stack.fused_nll_pair(
            jnp.asarray(params0), rb, dd, st)
        width = np.tile(np.asarray(w0, np.float32), (nch, 1))
        samples, nlls, accs = mcmc.stack.fused_segment_blocked(
            jnp.asarray(params0), (hi_b, lo_b), jnp.asarray(width),
            rb, dd, jnp.asarray(noise), jnp.asarray(log_u), st, m)
        assert samples.shape == (nsteps, nch, npar)
        for c in range(nch):
            s1, n1, a1 = mcmc.stack.fused_segment_blocked(
                jnp.asarray(params0[c]), (hi_b[c], lo_b[c]),
                jnp.asarray(width[c]), rb, dd,
                jnp.asarray(noise[:, :, c]),
                jnp.asarray(log_u[:, :, c]), st, m)
            np.testing.assert_allclose(
                np.asarray(samples[:, c]), np.asarray(s1),
                rtol=3e-7, atol=3e-7)
            np.testing.assert_array_equal(
                np.asarray(accs[:, c]), np.asarray(a1[:, 0]))

    def test_posterior_matches_scan_blocked(self):
        """The in-kernel blocked sampler targets the same posterior
        as the scan blocked stepper (same blocked RNG streams,
        measure-equivalent accept): posterior means agree within MC
        error on a short run."""
        from sxmc_tpu.mcmc.metropolis import MCMC as MCMC_cls

        obs, syst, sources, signals, data = _fixture(n_mc=20_000,
                                                     nevents=800)
        with force_pallas_interpret():
            mcmc_f = MCMC_cls(sources, signals, [syst], [obs])
        mcmc_f.stack.set_data(data)
        mcmc_s = MCMC_cls(sources, signals, [syst], [obs])
        mcmc_s.stack.set_data(data)
        ls_f = mcmc_f(data, 600, burnin_fraction=0.2, seed=4,
                      rate_substeps=3)
        ls_s = mcmc_s(data, 600, burnin_fraction=0.2, seed=4,
                      rate_substeps=3)
        for name in ("sig", "bkg"):
            f = ls_f.column(name)
            s = ls_s.column(name)
            assert abs(f.mean() - s.mean()) < 4 * max(
                s.std(), 1e-3), (name, f.mean(), s.mean())
