"""Sharded ensemble: fake experiments fanned out over the mesh.

Replaces the reference's serial experiment loop (sxmc.cpp:59-145): all
``nexperiments`` datasets are padded to a common event count (padding
rows carry an unknown dataset tag, so their read-bin sentinel -2 makes
them invisible to the NLL), their chains run as one
``vmap``-over-experiments x ``vmap``-over-chains batch, and the batch's
leading axes are sharded over the mesh's {exp, chain} axes with pjit.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sxmc_tpu.fitconfig import FitConfig
from sxmc_tpu.generator import make_fake_dataset
from sxmc_tpu.mcmc import metropolis
from sxmc_tpu.mcmc.metropolis import MCMC
from sxmc_tpu.parallel import mesh as mesh_lib
from sxmc_tpu.stats.likelihood import LikelihoodSpace

PAD_TAG = -999.0  # dataset tag no signal uses -> -2 read-bin sentinel


def pad_datasets(datasets: Sequence[np.ndarray],
                 nevents: Optional[int] = None) -> np.ndarray:
    """Stack ragged datasets into (nexp, nevents, ncols) with pad rows."""
    if nevents is None:
        nevents = max(d.shape[0] for d in datasets)
    ncols = datasets[0].shape[1]
    out = np.zeros((len(datasets), nevents, ncols), np.float32)
    out[:, :, -1] = PAD_TAG
    for i, d in enumerate(datasets):
        out[i, :d.shape[0]] = d[:nevents]
    return out


def run_sharded_ensemble(
    fc: FitConfig,
    mesh: Optional[Mesh] = None,
    nsteps: Optional[int] = None,
    verbose: bool = True,
) -> Tuple[List[LikelihoodSpace], List[float]]:
    """Generate + fit all experiments as one sharded batch.

    Returns the per-experiment likelihood spaces and upper limits on
    ``fc.signal_name``.
    """
    nsteps = nsteps or fc.nsteps
    if mesh is None:
        mesh = mesh_lib.auto_mesh(fc.nexperiments, fc.nchains)

    mcmc = MCMC(fc.sources, fc.signals, fc.systematics, fc.observables)
    if getattr(mcmc.stack, "_kde_exact", ()):
        raise NotImplementedError(
            "Exact-LUT KDE signals evaluate against ONE set_data() "
            "dataset; the batched multi-experiment path would pair "
            "every experiment with the wrong event coordinates. Use "
            "the serial ensemble driver, or kde_exact=false (grid).")

    key = jax.random.PRNGKey(fc.seed)
    datasets = [
        make_fake_dataset(jax.random.fold_in(key, i), fc.signals,
                          fc.systematics, fc.observables, poisson=True,
                          stack=mcmc.stack)
        for i in range(fc.nexperiments)
    ]
    data_batch = pad_datasets(datasets)
    rb = mcmc.stack.compute_read_bins(data_batch)  # (nexp, nsig, nev)

    nchains = max(fc.nchains, 1)
    keys = jnp.stack([
        jax.random.split(jax.random.fold_in(key, 1000 + i), nchains)
        for i in range(fc.nexperiments)])  # (nexp, nchain, 2)

    burnin_steps = int(nsteps * fc.burnin_fraction)

    device_data = mcmc.stack.device_data

    # Proposal geometry follows the fit config: diagonal widths, or
    # Haario full-covariance chains (fit.proposal = "full_cov").
    if getattr(fc, "proposal", "diagonal") == "full_cov":
        chain_fn = lambda k, rb_: metropolis._run_single_chain_fullcov(  # noqa: E731,E501
            mcmc, k, rb_, device_data, nsteps=nsteps,
            burnin_steps=burnin_steps, debug_mode=fc.debug_mode)
    else:
        chain_fn = lambda k, rb_: metropolis._run_single_chain(  # noqa: E731,E501
            mcmc, k, rb_, device_data, nsteps=nsteps,
            burnin_steps=burnin_steps, debug_mode=fc.debug_mode,
            rate_substeps=getattr(fc, 'rate_substeps', 0))

    def run_one_experiment(exp_keys, exp_rb):
        return jax.vmap(lambda k: chain_fn(k, exp_rb))(exp_keys)

    batched = jax.vmap(run_one_experiment)

    shard = NamedSharding(mesh, P("exp", "chain"))
    keys = jax.device_put(keys, shard)
    rb = jax.device_put(rb, NamedSharding(mesh, P("exp")))

    with mesh:
        samples, nlls, accept = jax.jit(batched)(keys, rb)
    samples = np.asarray(samples)  # (nexp, nchain, nkeep, npar)
    nlls = metropolis.nll_history_to_f64(nlls)

    lspaces = []
    limits = []
    for i in range(fc.nexperiments):
        ls = LikelihoodSpace.from_arrays(
            samples[i].reshape(-1, mcmc.nparameters), nlls[i].reshape(-1),
            mcmc.parameter_names, cl=fc.confidence,
            error_type=fc.error_type)
        lspaces.append(ls)
        if fc.signal_name and fc.signal_name in mcmc.parameter_names:
            bf = ls.get_best_fit()
            limits.append(bf[fc.signal_name].upper)
            if verbose:
                print(f"experiment {i}: {fc.signal_name}: "
                      f"{bf[fc.signal_name]}")
    return lspaces, limits
