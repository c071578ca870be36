"""Extended maximum-likelihood NLL.

TPU re-design of the reference 3-stage kernel pipeline
(reference: src/nll_kernels.cpp:89-188): grid-stride partial sums +
shared-memory tree reduction + scalar constraint kernel collapse into one
fused jitted expression; XLA emits the reduction, and on an event-sharded
mesh a ``psum`` finishes it.

The math, term for term:
  event term (nll_event_chunks, :89-116):
      s_i = sum_j pars[source_id_j] * nexpected_j * (norms_j / n_mc_j)
                  * lut[j, i]          (NaN lut values count as 0)
      sum_events = sum_i log(s_i)      (only where s_i > 0)
  total (nll_total, :149-188):
      nll = -sum_events
            + sum_j pars[source_id_j] * nexpected_j * norms_j / n_mc_j
            + sum_i 0.5 * ((p_i - mu_i) / sigma_i)^2   (where sigma_i > 0)
      barrier: 1e18 if any source rate is negative or the event term is
      non-finite.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

BARRIER = 1e18


class NLLStatic(NamedTuple):
    """Per-fit constants for the NLL.

    Store HOST (numpy) arrays here when the struct is closed over by
    jitted functions — captured device arrays degrade dispatch latency
    on tunneled backends; numpy constants embed in the executable.

    Attributes:
        nexpected: ``(nsignals,)`` expected events per signal at unit rate.
        n_mc: ``(nsignals,)`` MC sample counts per signal.
        source_id: ``(nsignals,)`` int32 index into the source block of the
            parameter vector (reference: mcmc.cpp:93-98).
        means: ``(nparams,)`` parameter means / expectations.
        sigmas: ``(nparams,)`` Gaussian constraint widths (0 = none).
        nsources: static count of rate parameters at the head of the
            parameter vector.
    """

    nexpected: jnp.ndarray
    n_mc: jnp.ndarray
    source_id: jnp.ndarray
    means: jnp.ndarray
    sigmas: jnp.ndarray
    nsources: int


def signal_weights(pars: jnp.ndarray, norms: jnp.ndarray,
                   st: NLLStatic) -> jnp.ndarray:
    """Per-signal event weight: rate * nexpected * efficiency.

    efficiency = norms / n_mc, with norms the current in-domain counts
    from the histogram build (nll_kernels.cpp:105-107).
    """
    rates = pars[st.source_id]
    return rates * st.nexpected * norms / st.n_mc


def nll(pars: jnp.ndarray, lut: jnp.ndarray, norms: jnp.ndarray,
        st: NLLStatic) -> jnp.ndarray:
    """Full extended-ML NLL.

    Args:
        pars: ``(nparams,)`` parameter vector — ``nsources`` rates then
            systematic coefficients.
        lut: ``(nsignals, nevents)`` PDF values at the data points (NaN for
            out-of-domain points).
        norms: ``(nsignals,)`` in-domain MC counts at current systematics.
        st: fit constants.

    Returns:
        Scalar f32 NLL (1e18 barrier applied).
    """
    pars = jnp.asarray(pars)
    w = signal_weights(pars, norms, st)
    lut0 = jnp.nan_to_num(lut, nan=0.0, posinf=0.0, neginf=0.0)
    s = jnp.einsum("j,ji->i", w, lut0, preferred_element_type=jnp.float32)
    event_sum = jnp.sum(jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)),
                                  0.0))

    total = -event_sum + jnp.sum(w)

    constrained = st.sigmas > 0
    z = (pars - st.means) / jnp.where(constrained, st.sigmas, 1.0)
    total = total + 0.5 * jnp.sum(jnp.where(constrained, z * z, 0.0))

    neg_rate = jnp.any(pars[:st.nsources] < 0)
    bad = neg_rate | ~jnp.isfinite(event_sum)
    return jnp.where(bad, jnp.float32(BARRIER), total)
