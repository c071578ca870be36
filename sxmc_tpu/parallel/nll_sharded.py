"""Event-sharded NLL: the 10M+ event path.

The reference chunks events with grid-stride partial sums + a
shared-memory reduction (nll_kernels.cpp:97-146, mcmc.cpp:37-44); the
TPU equivalent shards the event axis of the LUT over the mesh, takes
per-shard log-sums locally, and finishes with a ``psum`` over the
``event`` axis — the partial-sums pipeline reborn as one collective.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sxmc_tpu.ops.nll import BARRIER, NLLStatic, signal_weights


def event_sharded_nll(mesh: Mesh, st: NLLStatic):
    """Build nll(pars, lut, norms) with lut sharded over ``event``.

    Returns a jitted callable; ``lut`` is ``(nsignals, nevents)`` with
    the event axis laid out over the mesh's ``event`` axis.  The event
    log-sum is computed shard-locally and psum-finished, so no shard
    ever materializes the full LUT.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "event"), P()),
        out_specs=P(),
    )
    def _nll(pars, lut_shard, norms):
        w = signal_weights(pars, norms, st)
        lut0 = jnp.nan_to_num(lut_shard, nan=0.0, posinf=0.0, neginf=0.0)
        s = jnp.einsum("j,ji->i", w, lut0,
                       preferred_element_type=jnp.float32)
        local = jnp.sum(jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)),
                                  0.0))
        event_sum = jax.lax.psum(local, "event")

        total = -event_sum + jnp.sum(w)
        constrained = st.sigmas > 0
        z = (pars - st.means) / jnp.where(constrained, st.sigmas, 1.0)
        total = total + 0.5 * jnp.sum(jnp.where(constrained, z * z, 0.0))
        neg_rate = jnp.any(pars[:st.nsources] < 0)
        bad = neg_rate | ~jnp.isfinite(event_sum)
        return jnp.where(bad, jnp.float32(BARRIER), total)

    return jax.jit(_nll)


def shard_lut(mesh: Mesh, lut: jnp.ndarray) -> jnp.ndarray:
    """Lay a (nsignals, nevents) LUT out over the event axis."""
    return jax.device_put(lut, NamedSharding(mesh, P(None, "event")))
