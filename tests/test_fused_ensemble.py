"""Sharded-ensemble fused route: the experiment-grouped whole-segment
kernel under shard_map (8-device CPU mesh, interpret mode).

Contracts pinned here:
  * each (experiment, chain) trajectory of the grouped kernel is
    bit-identical to a single-chain ``run_segment`` launch with that
    experiment's read bins and the same per-chain key;
  * ``run_sharded_ensemble`` routes fused-eligible stacks through
    ``_batched_segment_fused`` (VERDICT r4 item 1) and kill-and-resume
    stays bit-exact on that route;
  * full_cov segment checkpointing resumes bit-exactly from running
    centered moments (VERDICT r4 item 5), on both the scan and the
    fused (grouped per-chain tril) paths.

The same grouped kernel runs on hardware in smoke_tpu.py
(fused_segment_grouped_shardmap case).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sxmc_tpu.fitconfig import FitConfig
from sxmc_tpu.mcmc import metropolis
from sxmc_tpu.mcmc.metropolis import MCMC
from sxmc_tpu.parallel import ensemble as par_ensemble
from sxmc_tpu.parallel import mesh as mesh_lib
from sxmc_tpu.pdf.stack import force_pallas_interpret

from test_fused_step import _fixture
from tests.test_mcmc import make_fixture


def _grouped_fixture(nexp=2, nchain=2, nevents=500):
    obs, syst, sources, signals, data = _fixture(n_mc=20_000,
                                                 nevents=nevents)
    with force_pallas_interpret():
        mcmc = MCMC(sources, signals, [syst], [obs])
    assert mcmc.stack.supports_fused
    rng = np.random.default_rng(4)
    datasets = [data[:nevents - 40 * i] for i in range(nexp)]
    batch = par_ensemble.pad_datasets(datasets)
    rb = mcmc.stack.compute_read_bins(batch)
    # Distinct starts/widths per (exp, chain).
    p0, nll0, w0 = metropolis.initial_state(
        mcmc, rb[0], mcmc.stack.device_data, allow_fused=True)
    npar = mcmc.nparameters
    params = np.tile(np.asarray(p0, np.float32), (nexp, nchain, 1))
    params += rng.uniform(-0.05, 0.05,
                          params.shape).astype(np.float32)
    width = np.tile(np.asarray(w0, np.float32), (nexp, nchain, 1))
    width *= rng.uniform(0.5, 1.5, width.shape).astype(np.float32)
    return mcmc, rb, jnp.asarray(params), jnp.asarray(width)


class TestGroupedFusedSegment:
    def test_matches_per_chain_run_segment(self):
        nexp, nchain, nsteps = 2, 2, 10
        mcmc, rb, params, width = _grouped_fixture(nexp, nchain)
        dd = mcmc.stack.device_data
        st = mcmc.static
        # Per-chain initial NLLs via the one-shot fused kernel.
        hi, lo = mcmc.stack.fused_nll_pair(
            params.reshape(-1, mcmc.nparameters), rb[0], dd, st)
        # fused_nll_pair shares one rb; recompute rows for exp 1.
        hi1, lo1 = mcmc.stack.fused_nll_pair(
            params[1], rb[1], dd, st)
        nll_hi = jnp.stack([hi.reshape(nexp, nchain)[0], hi1])
        nll_lo = jnp.stack([lo.reshape(nexp, nchain)[0], lo1])

        mesh = mesh_lib.make_mesh(exp=2, chain=2)
        key = jax.random.PRNGKey(5)
        keys = par_ensemble._segment_keys(key, nexp, nchain, 0, 0)
        with mesh:
            p, nll, samples, nlls, acc = \
                par_ensemble._batched_segment_fused(
                    mcmc, params, (nll_hi, nll_lo), width, keys, rb,
                    dd, nsteps, False, mesh)
        assert np.asarray(samples).shape == (nexp, nchain, nsteps,
                                             mcmc.nparameters)
        for e in range(nexp):
            for c in range(nchain):
                pf, nf, s1, n1, a1 = metropolis.run_segment(
                    mcmc, params[e, c], (nll_hi[e, c], nll_lo[e, c]),
                    width[e, c], rb[e], dd, keys[e, c], nsteps)
                np.testing.assert_array_equal(
                    np.asarray(samples)[e, c], np.asarray(s1))
                np.testing.assert_array_equal(
                    np.asarray(nlls[0])[e, c], np.asarray(n1[0]))
                np.testing.assert_array_equal(
                    np.asarray(p)[e, c], np.asarray(pf))

    def test_experiments_see_their_own_data(self):
        """Distinct datasets must give distinct NLL trajectories (the
        grouped rb batching is not a broadcast of experiment 0)."""
        nexp, nchain, nsteps = 2, 1, 8
        mcmc, rb, params, width = _grouped_fixture(nexp, nchain)
        dd = mcmc.stack.device_data
        st = mcmc.static
        params = jnp.asarray(
            np.tile(np.asarray(params[0, 0]), (nexp, nchain, 1)))
        width = jnp.asarray(
            np.tile(np.asarray(width[0, 0]), (nexp, nchain, 1)))
        his, los = [], []
        for e in range(nexp):
            h, l = mcmc.stack.fused_nll_pair(params[e], rb[e], dd, st)
            his.append(h)
            los.append(l)
        nll_hi, nll_lo = jnp.stack(his), jnp.stack(los)
        assert float(nll_hi[0, 0]) != float(nll_hi[1, 0])
        mesh = mesh_lib.make_mesh(exp=2, chain=1)
        keys = par_ensemble._segment_keys(jax.random.PRNGKey(1),
                                          nexp, nchain, 0, 0)
        # Same key for both experiments: trajectories must still split
        # because the rb rows differ.
        keys = jnp.asarray(
            np.tile(np.asarray(keys[:1]), (nexp, 1, 1)))
        with mesh:
            _, _, _, nlls, _ = par_ensemble._batched_segment_fused(
                mcmc, params, (nll_hi, nll_lo), width, keys, rb, dd,
                nsteps, False, mesh)
        assert not np.array_equal(np.asarray(nlls[0])[0],
                                  np.asarray(nlls[0])[1])


def _config(seed=3, proposal="diagonal", nexperiments=4):
    obs, systs, sources, signals = make_fixture(with_systematic=True,
                                                seed=9)
    return FitConfig(
        nexperiments=nexperiments, nsteps=250, burnin_fraction=0.2,
        signal_name="sig", seed=seed, nchains=2, proposal=proposal,
        observables=[obs], systematics=systs, sources=sources,
        signals=signals)


class TestFusedEnsembleRoute:
    def test_fused_route_taken_and_sane(self, tmp_path):
        fc = _config()
        calls = {"n": 0}
        real = par_ensemble._batched_segment_fused

        def counting(*args, **kwargs):
            calls["n"] += 1
            return real(*args, **kwargs)

        par_ensemble._batched_segment_fused = counting
        try:
            with force_pallas_interpret():
                ls, limits = par_ensemble.run_sharded_ensemble(
                    fc, verbose=False)
        finally:
            par_ensemble._batched_segment_fused = real
        assert calls["n"] >= 3  # two burn-in phases + sampling
        assert len(limits) == fc.nexperiments
        assert np.isfinite(limits).all()
        for l in ls:
            assert np.isfinite(l.nll_values).all()

    def test_kill_and_resume_bitwise_fused(self, tmp_path):
        fc = _config()

        with force_pallas_interpret():
            pA = str(tmp_path / "runA")
            lsA, limA = par_ensemble.run_sharded_ensemble(
                fc, verbose=False, checkpoint_path=pA,
                checkpoint_steps=40)

            pB = str(tmp_path / "runB")
            real = par_ensemble._batched_segment_fused
            calls = {"n": 0}

            def dying(*args, **kwargs):
                if calls["n"] >= 3:
                    raise RuntimeError("simulated preemption")
                calls["n"] += 1
                return real(*args, **kwargs)

            par_ensemble._batched_segment_fused = dying
            try:
                with pytest.raises(RuntimeError, match="preemption"):
                    par_ensemble.run_sharded_ensemble(
                        fc, verbose=False, checkpoint_path=pB,
                        checkpoint_steps=40)
            finally:
                par_ensemble._batched_segment_fused = real

            assert os.path.exists(pB + ".state.npz")
            lsB, limB = par_ensemble.run_sharded_ensemble(
                fc, verbose=False, checkpoint_path=pB,
                checkpoint_steps=40, resume=True)

        np.testing.assert_array_equal(np.asarray(limA),
                                      np.asarray(limB))
        for a, b in zip(lsA, lsB):
            np.testing.assert_array_equal(a.samples, b.samples)
            np.testing.assert_array_equal(a.nll_values, b.nll_values)


class TestFullCovSegmented:
    @pytest.mark.parametrize("interpret", [False, True])
    def test_fullcov_kill_and_resume_bitwise(self, tmp_path, interpret):
        """full_cov segment checkpointing (VERDICT r4 item 5): resume
        continues bit-identically, with retunes from running centered
        moments — on the vmapped scan path AND the grouped per-chain
        tril kernel."""
        fc = _config(proposal="full_cov")

        import contextlib
        ctx = force_pallas_interpret() if interpret \
            else contextlib.nullcontext()
        with ctx:
            pA = str(tmp_path / "covA")
            lsA, limA = par_ensemble.run_sharded_ensemble(
                fc, verbose=False, checkpoint_path=pA,
                checkpoint_steps=40)

            pB = str(tmp_path / "covB")
            seg_fns = ["_batched_segment", "_batched_segment_fused"]
            real = {n: getattr(par_ensemble, n) for n in seg_fns}
            calls = {"n": 0}

            def dying_wrap(fn):
                def dying(*args, **kwargs):
                    if calls["n"] >= 3:
                        raise RuntimeError("simulated preemption")
                    calls["n"] += 1
                    return fn(*args, **kwargs)
                return dying

            for n in seg_fns:
                setattr(par_ensemble, n, dying_wrap(real[n]))
            try:
                with pytest.raises(RuntimeError, match="preemption"):
                    par_ensemble.run_sharded_ensemble(
                        fc, verbose=False, checkpoint_path=pB,
                        checkpoint_steps=40)
            finally:
                for n in seg_fns:
                    setattr(par_ensemble, n, real[n])

            st = dict(np.load(pB + ".state.npz"))
            assert "pcross" in st and "cref" in st
            # The proposal state is the per-chain scale_tril.
            assert st["width"].ndim == 4
            lsB, limB = par_ensemble.run_sharded_ensemble(
                fc, verbose=False, checkpoint_path=pB,
                checkpoint_steps=40, resume=True)

        np.testing.assert_array_equal(np.asarray(limA),
                                      np.asarray(limB))
        for a, b in zip(lsA, lsB):
            np.testing.assert_array_equal(a.samples, b.samples)
            np.testing.assert_array_equal(a.nll_values, b.nll_values)

    def test_moment_retune_matches_history_retune(self):
        """_sharded_retune_cov (centered one-pass moments) agrees with
        retune_scale_tril (two-pass history covariance) to fp
        tolerance."""
        obs, systs, sources, signals = make_fixture(
            with_systematic=True, seed=9)
        mcmc = MCMC(sources, signals, systs, [obs])
        npar = mcmc.nparameters
        rng = np.random.default_rng(11)
        nexp, nch, n = 2, 2, 300
        base = np.asarray(mcmc.parameter_means, np.float32)
        hist = (base[None, None, None, :]
                + rng.normal(0, 0.1, (nexp, nch, n, npar))
                ).astype(np.float32)
        tril0 = np.tile(
            np.asarray(metropolis._initial_scale_tril(mcmc)),
            (nexp, nch, 1, 1)).astype(np.float32)
        cref = hist[:, :, 0, :]
        xc = hist - cref[:, :, None, :]
        psum = xc.sum(axis=2)
        pcross = np.einsum("ecsi,ecsj->ecij", xc, xc)
        got = par_ensemble._sharded_retune_cov(
            mcmc, jnp.asarray(tril0), jnp.float32(n),
            jnp.asarray(psum), jnp.asarray(pcross))
        want = jax.vmap(jax.vmap(
            lambda t, s: metropolis.retune_scale_tril(mcmc, t, s)))(
                jnp.asarray(tril0), jnp.asarray(hist))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-5)


class TestGroupedBlockedSegment:
    def test_blocked_grouped_matches_per_chain(self):
        """rate_substeps through the sharded ensemble's shard body:
        the grouped blocked kernel advances each (exp, chain) exactly
        as a standalone blocked run_segment with that experiment's rb
        and the same key."""
        nexp, nchain, nsteps, m = 2, 2, 6, 2
        mcmc, rb, params, width = _grouped_fixture(nexp, nchain)
        dd = mcmc.stack.device_data
        st = mcmc.static
        his, los = [], []
        for e in range(nexp):
            h, l = mcmc.stack.fused_nll_pair(params[e], rb[e], dd, st)
            his.append(h)
            los.append(l)
        nll_hi, nll_lo = jnp.stack(his), jnp.stack(los)

        mesh = mesh_lib.make_mesh(exp=2, chain=2)
        keys = par_ensemble._segment_keys(jax.random.PRNGKey(5),
                                          nexp, nchain, 0, 0)
        with mesh:
            p, nll, samples, nlls, acc = \
                par_ensemble._batched_segment_fused(
                    mcmc, params, (nll_hi, nll_lo), width, keys, rb,
                    dd, nsteps, False, mesh, m)
        for e in range(nexp):
            for c in range(nchain):
                pf, nf, s1, n1, a1 = metropolis.run_segment(
                    mcmc, params[e, c], (nll_hi[e, c], nll_lo[e, c]),
                    width[e, c], rb[e], dd, keys[e, c], nsteps,
                    rate_substeps=m)
                np.testing.assert_array_equal(
                    np.asarray(samples)[e, c], np.asarray(s1))
                np.testing.assert_array_equal(
                    np.asarray(nlls[0])[e, c], np.asarray(n1[0]))

    def test_blocked_kill_and_resume_bitwise(self, tmp_path):
        fc = _config()
        fc.rate_substeps = 3

        with force_pallas_interpret():
            pA = str(tmp_path / "bA")
            lsA, limA = par_ensemble.run_sharded_ensemble(
                fc, verbose=False, checkpoint_path=pA,
                checkpoint_steps=40)
            pB = str(tmp_path / "bB")
            real = par_ensemble._batched_segment_fused
            calls = {"n": 0}

            def dying(*args, **kwargs):
                if calls["n"] >= 2:
                    raise RuntimeError("simulated preemption")
                calls["n"] += 1
                return real(*args, **kwargs)

            par_ensemble._batched_segment_fused = dying
            try:
                with pytest.raises(RuntimeError, match="preemption"):
                    par_ensemble.run_sharded_ensemble(
                        fc, verbose=False, checkpoint_path=pB,
                        checkpoint_steps=40)
            finally:
                par_ensemble._batched_segment_fused = real
            lsB, limB = par_ensemble.run_sharded_ensemble(
                fc, verbose=False, checkpoint_path=pB,
                checkpoint_steps=40, resume=True)

        np.testing.assert_array_equal(np.asarray(limA),
                                      np.asarray(limB))
        for a, b in zip(lsA, lsB):
            np.testing.assert_array_equal(a.samples, b.samples)
