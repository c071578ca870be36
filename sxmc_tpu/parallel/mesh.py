"""Device-mesh construction for sharded fits.

The reference is single-process/single-GPU (SURVEY.md section 2.2); the
TPU framework maps its math onto a mesh with up to three axes:

  * ``exp``   — fake experiments (ensemble axis; DCN-friendly),
  * ``chain`` — MCMC chains per experiment (ICI),
  * ``event`` — the event dimension of the NLL reduction (ICI), the
    structural analog of sequence/context parallelism.

Collectives: the event-sharded NLL finishes with a psum; chain/ensemble
statistics pool with pmean/all_gather (see sxmc_tpu.parallel.ensemble).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    exp: int = 1,
    chain: int = 1,
    event: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build an {exp x chain x event} mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = exp * chain * event
    if n > len(devices):
        raise ValueError(
            f"Mesh {exp}x{chain}x{event} needs {n} devices, "
            f"have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(exp, chain, event)
    return Mesh(dev, axis_names=("exp", "chain", "event"))


def auto_mesh(nexperiments: int, nchains: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Pick a mesh: fill the experiment axis first, then chains."""
    if devices is None:
        devices = jax.devices()
    nd = len(devices)
    exp = min(nexperiments, nd) if nexperiments > 0 else 1
    while nd % exp != 0:
        exp -= 1
    chain = min(max(nchains, 1), nd // exp)
    while (nd // exp) % chain != 0:
        chain -= 1
    return make_mesh(exp=exp, chain=chain, event=1,
                     devices=devices[:exp * chain])


def experiment_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a leading (experiment, chain, ...) batch over the mesh."""
    return NamedSharding(mesh, P("exp", "chain"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (jax.distributed); no-op if single process."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process
