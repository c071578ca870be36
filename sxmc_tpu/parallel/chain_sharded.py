"""Fully event-sharded MCMC chain: the 10M+ event / 10M+ MC-sample path.

Both the MC samples (histogram build) and the data events (NLL
reduction) are sharded over the mesh's ``event`` axis; each step runs
under ``shard_map`` with two psums:

    local partial histogram  --psum-->  full bins + norms
    local event log-sum      --psum-->  full NLL event term

Every shard runs the identical proposal/accept RNG stream, so the chain
state stays replicated without broadcasts — the whole walk is one
``lax.scan`` per phase, as in the single-device path.

In-shard histogram: on TPU (per-segment Pallas stacks) each shard runs
the SAME fused Pallas kernel as the single-chip path — the MC samples
are pre-packed per shard on the host (each shard's slice is its own
valid per-segment packing, stacked along the sharded leading axis), so
the shard_map body is exactly the production kernel followed by a
psum.  The jnp MXU-matmul path remains the fallback (CPU meshes,
weighted MC, no dynamic segment); tests run the Pallas body in
interpret mode on the 8-device CPU mesh and smoke_tpu pins
Pallas-under-shard_map on hardware.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sxmc_tpu.mcmc.metropolis import MCMC, HAARIO, nll_history_to_f64
from sxmc_tpu.ops import histogram as hist_ops
from sxmc_tpu.ops.nll import (BARRIER, df_add, df_diff, df_sum,
                              signal_weights, two_sum)
from sxmc_tpu.pdf import evalhist
from sxmc_tpu.pdf.stack import _apply_masked_systematics
from sxmc_tpu.stats.likelihood import LikelihoodSpace


def _pad_to(n: int, mult: int) -> int:
    return -(-n // mult) * mult


def run_sharded_chain(
    mcmc: MCMC,
    data: np.ndarray,
    nsteps: int,
    burnin_fraction: float = 0.1,
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    debug_mode: bool = False,
) -> LikelihoodSpace:
    """Run one chain with MC samples + events sharded over ``event``."""
    if mesh is None:
        ndev = len(jax.devices())
        mesh = Mesh(np.asarray(jax.devices()), axis_names=("event",))
    ndev = mesh.shape["event"]
    stack = mcmc.stack
    if getattr(stack, "has_kde", False):
        raise NotImplementedError(
            "Event-sharded chains support binned PDFs only; KDE signals "
            "evaluate on the replicated path.")

    # --- shard the MC samples (pad with out-of-domain rows). ---
    # Host copies avoid device->host readbacks (see CLAUDE.md rule 2).
    # Static-segment skip (mirrors PdfStack): only signals some
    # systematic touches need per-step rebuilds — their samples shard;
    # static signals contribute a host-precomputed constant table.
    dyn_idx = stack._dyn_idx
    ndyn = stack._ndyn
    if ndyn < stack.nsignals:
        full_samples = stack.samples_host
        full_seg = stack.segment_ids_host
        sel = np.isin(full_seg, np.asarray(dyn_idx, np.int32))
        remap = np.zeros(stack.nsignals, np.int64)
        for j, i in enumerate(dyn_idx):
            remap[i] = j
        samples = full_samples[sel]
        seg = remap[full_seg[sel]].astype(np.int32)
        static_base = np.zeros((stack.nsignals, stack.total_nbins),
                               np.float32)
        if stack._static_idx:
            static_base[np.asarray(stack._static_idx)] = \
                stack._static_hists_np
    else:
        samples = stack.samples_host
        seg = stack.segment_ids_host
        static_base = None
    n = samples.shape[0]
    npad = _pad_to(max(n, 1), ndev * 8)
    pad_rows = np.full((npad - n, samples.shape[1]),
                       stack.lower_host[0] - 1e9, np.float32)
    samples_p = np.concatenate([samples, pad_rows])
    seg_p = np.concatenate([seg, np.zeros(npad - n, np.int32)])

    # --- shard the data events (pad with unknown dataset tag). ---
    data = np.asarray(data, np.float32)
    rb = np.asarray(stack.compute_read_bins(data))
    nev = rb.shape[1]
    nev_pad = _pad_to(nev, ndev * 8)
    rb_p = np.full((rb.shape[0], nev_pad), -2, np.int32)
    rb_p[:, :nev] = rb

    burnin_steps = int(nsteps * burnin_fraction)
    key = jax.random.PRNGKey(seed)

    nsources = mcmc.nsources
    st = mcmc.static
    fixed = jnp.asarray(mcmc.parameter_fixed)
    sf = HAARIO / max(mcmc.nfloat, 1)
    syst_float = (mcmc.nsystematics > 0) and not mcmc.systematics_fixed
    # No dynamic binned segment -> the histogram table is constant even
    # when systematic parameters float (they only enter constraints).
    rebuild = syst_float and ndyn > 0
    theta0_np = mcmc.parameter_means[nsources:].astype(np.float32)

    nbins = stack.nbins
    nsignals = stack.nsignals
    total_nbins = stack.total_nbins
    bin_volume = stack.bin_volume
    lower = np.asarray(stack.lower_host, np.float32)
    upper = np.asarray(stack.upper_host, np.float32)
    systematics = (stack.systematics if static_base is None
                   else stack._systematics_dyn)
    nseg_build = max(ndyn, 1)

    # --- Pallas in-shard build: pre-pack each shard's slice on the
    # host so the shard body runs the production per-segment kernel
    # unchanged (one packing per shard, stacked on the sharded axis).
    use_pallas_body = (stack.use_pallas
                       and getattr(stack, "_per_segment", False)
                       and not stack.has_weights and ndyn >= 1)
    if use_pallas_body:
        from sxmc_tpu.ops import pallas_hist

        seg_chunk = stack._seg_chunk
        shard_n = npad // ndev
        packed_list, cs_list = [], []
        for d in range(ndev):
            sl = slice(d * shard_n, (d + 1) * shard_n)
            pk, cs = pallas_hist.pack_samples_per_segment(
                samples_p[sl], stack.lower_host, seg_p[sl], nseg_build,
                chunk=seg_chunk)
            packed_list.append(pk)
            cs_list.append(cs)
        max_chunks = max(c.shape[1] for c in cs_list)
        nrows_pk = packed_list[0].shape[0]
        for d in range(ndev):
            nc = cs_list[d].shape[1]
            if nc < max_chunks:
                extra = (max_chunks - nc) * seg_chunk
                pad = np.full((nrows_pk, extra // 128, 128),
                              stack.lower_host[0] - 1e9, np.float32)
                packed_list[d] = np.concatenate(
                    [packed_list[d], pad], axis=1)
                cs_list[d] = np.concatenate(
                    [cs_list[d],
                     np.zeros((1, max_chunks - nc), np.int32)], axis=1)
        hist_in_host = (np.stack(packed_list), np.stack(cs_list))
        hist_in_specs = (P("event", None, None, None),
                         P("event", None, None))
    else:
        hist_in_host = (samples_p, seg_p)
        hist_in_specs = (P("event"), P("event"))

    def _assemble_static(dyn_h):
        dyn_h = jax.lax.psum(dyn_h, "event")
        if static_base is None:
            hists = dyn_h
        else:
            hists = jnp.asarray(static_base)
            if ndyn:
                hists = hists.at[np.asarray(dyn_idx)].set(dyn_h)
        return hists, hists.sum(axis=1)

    def local_hists(hist_in, theta):
        if use_pallas_body:
            packed_l, chunkseg_l = hist_in
            flat = pallas_hist.pallas_histogram_segmented(
                packed_l[0], chunkseg_l[0], stack._mask_matrix, theta,
                nfields=stack.nfields, nobs=len(nbins),
                systematics=stack._pallas_systs,
                lower=stack.lower_host, upper=stack.upper_host,
                nbins=nbins, nsegments=nseg_build, chunk=seg_chunk,
                interpret=stack._interpret)
            return _assemble_static(
                flat.reshape(nseg_build, total_nbins))
        samples_l, seg_l = hist_in
        transformed = _apply_masked_systematics(
            samples_l, seg_l, theta, systematics, nseg_build)
        dyn_h, _ = hist_ops.segmented_histogram(
            transformed[:, :len(nbins)], seg_l,
            jnp.ones(samples_l.shape[0], bool),
            jnp.asarray(lower), jnp.asarray(upper), nbins, nseg_build)
        return _assemble_static(dyn_h)

    def sharded_nll(params, hist_in, rb_l, hists0, norms0):
        """Compensated (hi, lo) NLL with the event sum psum'd.

        Each shard accumulates its local log-sum as a TwoSum pair (the
        double-accumulation analog of nll_kernels.cpp:89-116); the hi
        and lo parts psum independently — the lo parts are ~ulp-sized,
        so their plain-f32 all-reduce is exact to second order.
        """
        if rebuild:
            hists, norms = local_hists(hist_in, params[nsources:])
        else:
            hists, norms = hists0, norms0
        lut = jax.vmap(evalhist.eval_from_bins,
                       in_axes=(0, 0, None, 0))(
            hists, norms, bin_volume, rb_l)
        w = signal_weights(params, norms, st)
        lut0 = jnp.nan_to_num(lut, nan=0.0)
        s = jnp.einsum("j,ji->i", w, lut0,
                       preferred_element_type=jnp.float32)
        # Same dot->log->reduce fusion fence as ops.nll.nll_pair (the
        # fused form SIGABRTs the XLA:TPU backend).
        s = jax.lax.optimization_barrier(s)
        logs = jnp.where(s > 0, jnp.log(jnp.where(s > 0, s, 1.0)), 0.0)
        l_hi, l_lo = df_sum(logs)
        ev_hi = jax.lax.psum(l_hi, "event")
        ev_lo = jax.lax.psum(l_lo, "event")
        ev_hi, ev_lo = two_sum(ev_hi, ev_lo)

        w_hi, w_lo = df_sum(w)
        constrained = st.sigmas > 0
        z = (params - st.means) / np.where(constrained, st.sigmas, 1.0)
        con = 0.5 * jnp.sum(jnp.where(constrained, z * z, 0.0))
        hi, lo = df_add(-ev_hi, -ev_lo, w_hi, w_lo)
        hi, lo = df_add(hi, lo, con, jnp.zeros_like(con))
        bad = jnp.any(params[:nsources] < 0) | ~jnp.isfinite(ev_hi)
        hi = jnp.where(bad, jnp.float32(BARRIER), hi)
        lo = jnp.where(bad, jnp.float32(0.0), lo)
        return hi, lo

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(hist_in_specs, P(None, "event"), P()),
        out_specs=(P(), (P(), P()), P()),
        # pallas_call carries no varying-mesh-axes metadata, so the
        # vma checker cannot see through the in-shard kernel.
        check_vma=False,
    )
    def run(hist_in, rb_l, key):
        if not rebuild:
            hists0, norms0 = local_hists(hist_in,
                                         jnp.asarray(theta0_np))
        else:
            hists0 = norms0 = None

        def chain_nll(params):
            return sharded_nll(params, hist_in, rb_l, hists0, norms0)

        def step(carry, step_key):
            params, (cur_hi, cur_lo), width = carry
            k_prop, k_accept = jax.random.split(step_key)
            noise = jax.random.normal(k_prop, params.shape) * \
                jnp.maximum(width, 0.0)
            proposed = jnp.where(width > 0, params + noise, params)
            prop_hi, prop_lo = chain_nll(proposed)
            u = jax.random.uniform(k_accept, ())
            delta = df_diff(cur_hi, cur_lo, prop_hi, prop_lo)
            accept = debug_mode | (delta > 0) | (u <= jnp.exp(delta))
            params = jnp.where(accept, proposed, params)
            cur_hi = jnp.where(accept, prop_hi, cur_hi)
            cur_lo = jnp.where(accept, prop_lo, cur_lo)
            return ((params, (cur_hi, cur_lo), width),
                    (params, (cur_hi, cur_lo),
                     accept.astype(jnp.float32)))

        def phase(carry, k, nsteps_phase):
            return jax.lax.scan(step, carry,
                                jax.random.split(k, nsteps_phase))

        def retune(width, phase_samples):
            rms = jnp.std(phase_samples, axis=0)
            new = jnp.where(rms > 0, sf * rms, width)
            return jnp.where(fixed, -1.0, new)

        params0 = jnp.asarray(mcmc.parameter_means, jnp.float32)
        nll0 = chain_nll(params0)
        width0 = jnp.asarray(mcmc.initial_jump_widths())
        carry = (params0, nll0, width0)

        k1, k2, k3 = jax.random.split(key, 3)
        if burnin_steps > 0:
            carry, (s1, _, _) = phase(carry, k1, burnin_steps)
            p, c, w = carry
            carry = (p, c, retune(w, s1))
            carry, (s2, _, _) = phase(carry, k2, burnin_steps)
            p, c, w = carry
            carry = (p, c, retune(w, s2))
        remaining = max(
            nsteps - (2 * burnin_steps if burnin_steps > 0 else 0), 1)
        carry, (s3, n3, a3) = phase(carry, k3, remaining)
        return s3, n3, a3.mean()

    with mesh:
        hist_in_s = tuple(
            jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
            for a, spec in zip(hist_in_host, hist_in_specs))
        rb_s = jax.device_put(
            jnp.asarray(rb_p), NamedSharding(mesh, P(None, "event")))
        chain, nlls, accept = run(hist_in_s, rb_s, key)

    mcmc.last_accept_rate = float(np.asarray(accept))
    return LikelihoodSpace.from_arrays(
        np.asarray(chain), nll_history_to_f64(nlls),
        mcmc.parameter_names)
