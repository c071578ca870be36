"""HMC sampler tests: posterior recovery vs the Metropolis reference."""

import numpy as np
import jax
import pytest

from sxmc_tpu.generator import make_fake_dataset
from sxmc_tpu.mcmc.hmc import HMC
from sxmc_tpu.mcmc.metropolis import MCMC
from tests.test_mcmc import make_fixture


class TestHMC:
    def test_posterior_recovery(self):
        obs, systs, sources, signals = make_fixture()
        data = make_fake_dataset(jax.random.PRNGKey(4), signals, systs,
                                 [obs], poisson=False)
        hmc = HMC(sources, signals, systs, [obs])
        ls = hmc(data, nsteps=3000, burnin_fraction=0.3, seed=6)
        bf = ls.get_best_fit()
        assert abs(bf["sig"].point_estimate - 1.0) < 0.3, bf["sig"]
        assert abs(bf["bkg"].point_estimate - 1.0) < 0.2, bf["bkg"]
        assert hmc.last_accept_rate > 0.4

    def test_matches_metropolis_posterior(self):
        obs, systs, sources, signals = make_fixture(seed=3)
        data = make_fake_dataset(jax.random.PRNGKey(8), signals, systs,
                                 [obs], poisson=False)
        met = MCMC(sources, signals, systs, [obs])
        ls_m = met(data, nsteps=20000, burnin_fraction=0.2, seed=9)
        hmc = HMC(sources, signals, systs, [obs])
        ls_h = hmc(data, nsteps=4000, burnin_fraction=0.3, seed=9)

        # Posterior means and widths agree within MC error.
        for name in ["sig", "bkg"]:
            m_mean = ls_m.column(name).mean()
            h_mean = ls_h.column(name).mean()
            m_std = ls_m.column(name).std()
            h_std = ls_h.column(name).std()
            assert abs(m_mean - h_mean) < 4 * m_std / np.sqrt(100), \
                (name, m_mean, h_mean)
            assert 0.5 < h_std / m_std < 2.0, (name, m_std, h_std)

    def test_rates_stay_positive(self):
        obs, systs, sources, signals = make_fixture()
        data = make_fake_dataset(jax.random.PRNGKey(4), signals, systs,
                                 [obs], poisson=False)
        hmc = HMC(sources, signals, systs, [obs])
        ls = hmc(data, nsteps=1000, burnin_fraction=0.3, seed=2)
        assert (ls.column("sig") > 0).all()
        assert (ls.column("bkg") > 0).all()

    def test_fixed_parameter_pinned(self):
        obs, systs, sources, signals = make_fixture()
        sources[1].fixed = True
        data = make_fake_dataset(jax.random.PRNGKey(4), signals, systs,
                                 [obs], poisson=False)
        hmc = HMC(sources, signals, systs, [obs])
        ls = hmc(data, nsteps=600, burnin_fraction=0.3, seed=2)
        np.testing.assert_allclose(ls.column("bkg"), 1.0, rtol=1e-6)

    def test_floating_systematic(self):
        obs, systs, sources, signals = make_fixture(with_systematic=True)
        data = make_fake_dataset(jax.random.PRNGKey(4), signals, systs,
                                 [obs], poisson=False)
        hmc = HMC(sources, signals, systs, [obs])
        ls = hmc(data, nsteps=1500, burnin_fraction=0.3, seed=2)
        bf = ls.get_best_fit()
        assert abs(bf["energy_shift_0"].point_estimate) < 0.2
