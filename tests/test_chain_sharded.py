"""Event-sharded chain tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from sxmc_tpu.generator import make_fake_dataset
from sxmc_tpu.mcmc.metropolis import MCMC
from sxmc_tpu.parallel.chain_sharded import run_sharded_chain
from tests.test_mcmc import make_fixture


class TestShardedChain:
    def test_matches_unsharded_posterior(self):
        obs, systs, sources, signals = make_fixture(seed=5)
        data = make_fake_dataset(jax.random.PRNGKey(2), signals, systs,
                                 [obs], poisson=False)
        mcmc = MCMC(sources, signals, systs, [obs])

        ls_ref = mcmc(data, nsteps=8000, burnin_fraction=0.2, seed=11)
        ls_sh = run_sharded_chain(mcmc, data, nsteps=8000,
                                  burnin_fraction=0.2, seed=12)

        for name in ["sig", "bkg"]:
            m_ref = ls_ref.column(name).mean()
            m_sh = ls_sh.column(name).mean()
            s_ref = ls_ref.column(name).std()
            assert abs(m_ref - m_sh) < 5 * s_ref / np.sqrt(50), \
                (name, m_ref, m_sh)

    def test_floating_systematics_sharded(self):
        obs, systs, sources, signals = make_fixture(
            with_systematic=True, seed=5)
        data = make_fake_dataset(jax.random.PRNGKey(2), signals, systs,
                                 [obs], poisson=False)
        mcmc = MCMC(sources, signals, systs, [obs])
        ls = run_sharded_chain(mcmc, data, nsteps=2000,
                               burnin_fraction=0.2, seed=3)
        bf = ls.get_best_fit()
        assert abs(bf["energy_shift_0"].point_estimate) < 0.2
        assert abs(bf["sig"].point_estimate - 1.0) < 0.4
        assert np.isfinite(ls.nll_values).all()
