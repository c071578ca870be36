"""On-TPU Pallas correctness smoke test.

tests/test_pallas_hist.py proves kernel == jnp in INTERPRET mode on
CPU; this script asserts the same equalities on the real TPU, catching
Mosaic layout/dtype regressions interpret mode cannot see (int8 vs
bf16 one-hot paths, `>>`/`&` lowerings, SMEM scalar reads, the
(nsegments, b1, b2) accumulator).  Run alongside bench.py each round:

    python smoke_tpu.py          # prints one PASS/FAIL line per case

Single process only (TPU tunnel); safe to run under `timeout 600`.

Structure note (measured): the first device->host readback drops the
process into ~27 ms-per-dispatch sync mode, so every case fuses its
jnp reference, the Pallas kernel, and the comparison into ONE jitted
program returning a single scalar — one dispatch + one readback per
case.  (The original per-segment Python comparison loops took >10
minutes in degraded mode; this version runs the whole suite in ~2-3
compiles' time.)
"""

import os
import sys

import numpy as np

# SMOKE_INTERPRET=1 runs the kernels in interpret mode so the harness
# itself can be validated on CPU (the real run needs the TPU).
INTERPRET = bool(os.environ.get("SMOKE_INTERPRET"))

CASES = []


def case(name):
    def deco(fn):
        CASES.append((name, fn))
        return fn
    return deco


def _ref_hist(samples, theta, systs, lower, upper, nbins):
    """jnp reference histogram (traced; runs inside the case's jit)."""
    import jax.numpy as jnp

    from sxmc_tpu.ops import histogram as hist_ops
    from sxmc_tpu.ops.transforms import apply_systematics

    transformed = apply_systematics(samples, theta, systs)
    ids, valid = hist_ops.compute_bin_ids(
        transformed[:, :len(nbins)], jnp.asarray(lower),
        jnp.asarray(upper), nbins)
    total = hist_ops.total_bins(nbins)
    return hist_ops.fixed_bincount(ids, valid.astype(jnp.float32), total)


def _maxdiff(ref, got):
    """Max |ref - got| treating matching NaNs as equal (traced)."""
    import jax.numpy as jnp

    both_nan = jnp.isnan(ref) & jnp.isnan(got)
    d = jnp.where(both_nan, 0.0, ref - got)
    # A NaN on only one side must fail loudly.
    one_nan = jnp.isnan(ref) ^ jnp.isnan(got)
    return jnp.max(jnp.abs(jnp.where(one_nan, jnp.inf, d)))


def _run(fn, *args, atol=0.0):
    """jit fn -> scalar maxdiff; assert with ONE readback."""
    import jax

    diff = float(np.asarray(jax.jit(fn)(*args)))
    assert diff <= atol, f"maxdiff {diff} > {atol}"


@case("1d_bf16_split")
def smoke_1d():
    # 1000 bins -> (32, 32) split, bf16 one-hots.
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    rng = np.random.default_rng(1)
    samples = rng.normal(0.5, 0.2, (200_000, 1)).astype(np.float32)
    theta = jnp.asarray([0.013], jnp.float32)
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    packed = jnp.asarray(pallas_hist.pack_samples(samples, (0.0,)))

    def check(packed, samples, theta):
        ref = _ref_hist(samples, theta, (syst,), (0.0,), (1.0,), (1000,))
        got = pallas_hist.pallas_histogram(
            packed, theta, nfields=1, nobs=1,
            systematics=((syst, None),), lower=(0.0,), upper=(1.0,),
            nbins=(1000,), interpret=INTERPRET)
        return _maxdiff(ref, got)

    _run(check, packed, jnp.asarray(samples), theta)


@case("2d_hist")
def smoke_2d():
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SCALE, SHIFT, SystematicDesc

    rng = np.random.default_rng(2)
    n = 100_000
    samples = np.stack([rng.normal(0.5, 0.2, n), rng.uniform(0, 1, n)],
                       axis=1).astype(np.float32)
    theta = jnp.asarray([0.03, -0.05], jnp.float32)
    systs = (SystematicDesc(SHIFT, obs=0, par_indices=(0,)),
             SystematicDesc(SCALE, obs=1, par_indices=(1,)))
    lower, upper, nbins = (0.0, 0.0), (1.0, 1.0), (40, 25)
    packed = jnp.asarray(pallas_hist.pack_samples(samples, lower))

    def check(packed, samples, theta):
        ref = _ref_hist(samples, theta, systs, lower, upper, nbins)
        got = pallas_hist.pallas_histogram(
            packed, theta, nfields=2, nobs=2,
            systematics=tuple((d, None) for d in systs),
            lower=lower, upper=upper, nbins=nbins, interpret=INTERPRET)
        return _maxdiff(ref, got)

    _run(check, packed, jnp.asarray(samples), theta)


@case("segmented_int8_split_with_masks")
def smoke_segmented():
    # 29 segments x 1000 bins -> global split > 160 lanes: int8 path.
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    rng = np.random.default_rng(3)
    n, nseg = 300_000, 29
    samples = rng.normal(0.5, 0.2, (n, 1)).astype(np.float32)
    seg = np.sort(rng.integers(0, nseg, n)).astype(np.int32)
    theta = jnp.asarray([0.02], jnp.float32)
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    sig_mask = tuple(int(s % 3 != 1) for s in range(nseg))

    packed = jnp.asarray(pallas_hist.pack_samples(
        samples, (0.0,), segment_ids=seg.astype(np.float32)))
    seg_j = jnp.asarray(seg)

    def check(packed, samples, seg_j, theta):
        got = pallas_hist.pallas_histogram(
            packed, theta, nfields=1, nobs=1,
            systematics=((syst, sig_mask),), lower=(0.0,),
            upper=(1.0,), nbins=(1000,), nsegments=nseg,
            interpret=INTERPRET)
        got = got.reshape(nseg, 1000)
        diff = jnp.float32(0)
        for s in range(nseg):
            active = (syst,) if sig_mask[s] else ()
            in_seg = (seg_j == s)[:, None]
            # Push other segments' rows out of domain: identical
            # validity semantics, no data-dependent shapes.
            masked = jnp.where(in_seg, samples, -1e9)
            ref = _ref_hist(masked, theta, active, (0.0,), (1.0,),
                            (1000,))
            diff = jnp.maximum(diff, _maxdiff(ref, got[s]))
        return diff

    _run(check, packed, jnp.asarray(samples), seg_j, theta)


@case("per_segment_kernel")
def smoke_per_segment():
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    rng = np.random.default_rng(4)
    n, nseg = 300_000, 7
    samples = rng.normal(0.5, 0.2, (n, 1)).astype(np.float32)
    seg = np.sort(rng.integers(0, nseg, n))
    theta = jnp.asarray([0.015], jnp.float32)
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    mask = np.asarray([[int(s % 2 == 0) for s in range(nseg)]], np.int32)

    packed, chunk_seg = pallas_hist.pack_samples_per_segment(
        samples, (0.0,), seg, nseg, chunk=16384)
    seg_j = jnp.asarray(seg.astype(np.int32))

    def check(packed, samples, seg_j, theta):
        got = pallas_hist.pallas_histogram_segmented(
            packed, chunk_seg, mask, theta, nfields=1, nobs=1,
            systematics=((syst, 0),), lower=(0.0,), upper=(1.0,),
            nbins=(1000,), nsegments=nseg, chunk=16384,
            interpret=INTERPRET)
        got = got.reshape(nseg, 1000)
        diff = jnp.float32(0)
        for s in range(nseg):
            active = (syst,) if mask[0, s] else ()
            masked = jnp.where((seg_j == s)[:, None], samples, -1e9)
            ref = _ref_hist(masked, theta, active, (0.0,), (1.0,),
                            (1000,))
            diff = jnp.maximum(diff, _maxdiff(ref, got[s]))
        return diff

    _run(check, jnp.asarray(packed), jnp.asarray(samples), seg_j, theta)


@case("per_segment_multichain")
def smoke_per_segment_chains():
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    rng = np.random.default_rng(5)
    n, nseg, nch = 100_000, 3, 4
    samples = rng.normal(0.5, 0.2, (n, 1)).astype(np.float32)
    seg = np.sort(rng.integers(0, nseg, n))
    thetas = jnp.asarray(rng.normal(0, 0.02, (nch, 1)), jnp.float32)
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))

    packed, chunk_seg = pallas_hist.pack_samples_per_segment(
        samples, (0.0,), seg, nseg, chunk=16384)
    seg_j = jnp.asarray(seg.astype(np.int32))

    def check(packed, samples, seg_j, thetas):
        got = pallas_hist.pallas_histogram_segmented(
            packed, chunk_seg, np.ones((1, nseg), np.int32), thetas,
            nfields=1, nobs=1, systematics=((syst, None),),
            lower=(0.0,), upper=(1.0,), nbins=(600,), nsegments=nseg,
            chunk=16384, interpret=INTERPRET)
        got = got.reshape(nch, nseg, 600)
        diff = jnp.float32(0)
        for c in range(nch):
            for s in range(nseg):
                masked = jnp.where((seg_j == s)[:, None], samples,
                                   -1e9)
                ref = _ref_hist(masked, thetas[c], (syst,), (0.0,),
                                (1.0,), (600,))
                diff = jnp.maximum(diff, _maxdiff(ref, got[c, s]))
        return diff

    _run(check, jnp.asarray(packed), jnp.asarray(samples), seg_j,
         thetas)


@case("weighted_hist")
def smoke_weighted():
    import jax.numpy as jnp

    from sxmc_tpu.ops import histogram as hist_ops
    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import (SHIFT, SystematicDesc,
                                         apply_systematics)

    rng = np.random.default_rng(7)
    n = 200_000
    samples = rng.normal(0.5, 0.2, (n, 1)).astype(np.float32)
    weights = rng.uniform(0.1, 3.0, n).astype(np.float32)
    theta = jnp.asarray([0.011], jnp.float32)
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    packed = jnp.asarray(pallas_hist.pack_samples(
        samples, (0.0,), weights=weights))

    def check(packed, samples, weights, theta):
        transformed = apply_systematics(samples, theta, (syst,))
        ids, valid = hist_ops.compute_bin_ids(
            transformed[:, :1], jnp.asarray((0.0,)),
            jnp.asarray((1.0,)), (1000,))
        ref = hist_ops.fixed_bincount(
            ids, valid.astype(jnp.float32) * weights, 1000)
        got = pallas_hist.pallas_histogram(
            packed, theta, nfields=1, nobs=1,
            systematics=((syst, None),), lower=(0.0,), upper=(1.0,),
            nbins=(1000,), has_weights=True, interpret=INTERPRET)
        return _maxdiff(ref, got) / jnp.maximum(jnp.max(jnp.abs(ref)),
                                                1.0)

    _run(check, packed, jnp.asarray(samples), jnp.asarray(weights),
         theta, atol=1e-5)


@case("eval_lut_sentinels")
def smoke_eval_lut():
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.pdf.evalhist import eval_from_bins

    rng = np.random.default_rng(6)
    nseg, nbins = 5, 1000
    hists = rng.integers(0, 50, (nseg, nbins)).astype(np.float32)
    norms = hists.sum(axis=1)
    npts = 3000
    rb = rng.integers(0, nbins, (nseg, npts)).astype(np.int32)
    rb[:, 10] = -1   # out-of-domain -> NaN
    rb[:, 20] = -2   # dataset mismatch -> 0
    bin_volume = 1.0 / nbins
    rb_packed = jnp.asarray(pallas_hist.pack_read_bins(rb, chunk=1024))

    def check(hists, norms, rb_packed, rb):
        got = pallas_hist.pallas_eval_lut(
            hists.reshape(-1), norms, rb_packed, total_nbins=nbins,
            nsegments=nseg, bin_volume=bin_volume, chunk=1024,
            interpret=INTERPRET)[:, :npts]
        ref = jax.vmap(eval_from_bins, in_axes=(0, 0, None, 0))(
            hists, norms, bin_volume, rb)
        return _maxdiff(ref, got) / jnp.maximum(jnp.max(
            jnp.where(jnp.isnan(ref), 0.0, jnp.abs(ref))), 1e-9)

    _run(check, jnp.asarray(hists), jnp.asarray(norms), rb_packed,
         jnp.asarray(rb), atol=1e-6)


@case("stack_static_mix")
def smoke_stack_static():
    """PdfStack with a static (no-systematic) signal on the device
    path: dynamic kernel + host-precomputed static rows must equal the
    full jnp reference, single and batched."""
    if INTERPRET:
        print("  (skipped under SMOKE_INTERPRET: PdfStack picks the "
              "device path itself)", file=sys.stderr)
        return
    import jax.numpy as jnp

    from sxmc_tpu.pdf.stack import PdfStack
    from sxmc_tpu.signal import Observable, Signal, Source, Systematic
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    rng = np.random.default_rng(8)
    obs = Observable(name="energy", field="energy", bins=100, lower=0.0,
                     upper=10.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.1],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    mc_dyn = rng.normal(5, 1.5, (150_000, 1)).astype(np.float32)
    mc_sta = rng.uniform(0, 10, (250_000, 1)).astype(np.float32)
    sig = Signal.from_table(
        "sig", "s", mc_dyn, ["energy"], 0,
        Source(name="s", index=0, mean=1.0), 100.0, fields, [obs], [],
        [syst])
    bkg = Signal.from_table(
        "bkg", "b", mc_sta, ["energy"], 0,
        Source(name="b", index=1, mean=1.0), 200.0, fields, [obs], [],
        [])
    stack = PdfStack([sig, bkg], [obs], [syst])
    assert stack.use_pallas and stack._static_idx == (1,)
    desc = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    dd = stack.device_data
    # Static reference is theta-invariant: compare once on the host
    # convention already proven by the test suite, here just against
    # itself per theta inside the jit.
    sta_ref = jnp.asarray(stack._static_hists_np[0])

    def check(packed, mc_dyn, thetas):
        diff = jnp.float32(0)
        for t in range(3):
            theta = thetas[t]
            h, _ = stack.histograms(theta, (packed,))
            ref_dyn = _ref_hist(mc_dyn, theta, (desc,), (0.0,), (10.0,),
                                (100,))
            diff = jnp.maximum(diff, _maxdiff(ref_dyn, h[0]))
            diff = jnp.maximum(diff, _maxdiff(sta_ref, h[1]))
        hb, _ = stack.histograms_batch(thetas, (packed,))
        for c in range(3):
            ref_dyn = _ref_hist(mc_dyn, thetas[c], (desc,), (0.0,),
                                (10.0,), (100,))
            diff = jnp.maximum(diff, _maxdiff(ref_dyn, hb[c, 0]))
            diff = jnp.maximum(diff, _maxdiff(sta_ref, hb[c, 1]))
        return diff

    thetas = jnp.asarray([[0.0], [0.1], [-0.1]], jnp.float32)
    _run(check, dd[0], jnp.asarray(mc_dyn), thetas)


@case("pallas_under_shard_map")
def smoke_shard_map():
    """The per-segment kernel INSIDE a shard_map body on a 1-device
    TPU mesh (the chain_sharded in-shard build): Mosaic must compile
    and the psum'd result must equal the plain kernel call exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from sxmc_tpu.ops import pallas_hist
    from sxmc_tpu.ops.transforms import SHIFT, SystematicDesc

    rng = np.random.default_rng(11)
    n, nseg = 200_000, 3
    samples = rng.normal(0.5, 0.2, (n, 1)).astype(np.float32)
    seg = np.sort(rng.integers(0, nseg, n))
    theta = jnp.asarray([0.012], jnp.float32)
    syst = SystematicDesc(SHIFT, obs=0, par_indices=(0,))
    mask = np.ones((1, nseg), np.int32)

    packed, chunk_seg = pallas_hist.pack_samples_per_segment(
        samples, (0.0,), seg, nseg, chunk=16384)
    mesh = Mesh(np.asarray(jax.devices()[:1]), axis_names=("event",))

    def kernel_call(packed, chunk_seg, theta):
        return pallas_hist.pallas_histogram_segmented(
            packed, chunk_seg, mask, theta, nfields=1, nobs=1,
            systematics=((syst, None),), lower=(0.0,), upper=(1.0,),
            nbins=(500,), nsegments=nseg, chunk=16384,
            interpret=INTERPRET)

    def body(packed_l, chunkseg_l, theta):
        return jax.lax.psum(
            kernel_call(packed_l[0], chunkseg_l[0], theta), "event")

    def check(packed_b, chunkseg_b, packed, chunk_seg_j, theta):
        with mesh:
            got = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("event", None, None, None),
                          P("event", None, None), P()),
                out_specs=P(), check_vma=False)(
                    packed_b, chunkseg_b, theta)
        ref = kernel_call(packed, chunk_seg_j, theta)
        return _maxdiff(ref, got)

    _run(check, jnp.asarray(packed[None]),
         jnp.asarray(chunk_seg[None]), jnp.asarray(packed),
         jnp.asarray(chunk_seg), theta)


@case("fused_step")
def smoke_fused_step():
    """The fused histogram->LUT->log-sum step kernel on hardware:
    histogram must equal the split path exactly; the compensated NLL
    must agree with nll_pair to ulp scale (Mosaic transcendental and
    FMA rounding may differ from XLA by ~1 ulp per log)."""
    import jax.numpy as jnp

    from sxmc_tpu.ops.nll import NLLStatic, nll_pair
    from sxmc_tpu.pdf.stack import PdfStack
    from sxmc_tpu.signal import Observable, Signal, Source, Systematic

    rng = np.random.default_rng(10)
    obs = Observable(name="energy", field="energy", bins=100, lower=5.0,
                     upper=15.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.05],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    n_mc = 200_000
    sig_mc = rng.normal(10, 1, (n_mc, 1)).astype(np.float32)
    bkg_mc = rng.uniform(5, 15, (n_mc, 1)).astype(np.float32)
    src_s = Source(name="sig", index=0, mean=1.0)
    src_b = Source(name="bkg", index=1, mean=1.0, sigma=0.1)
    sig = Signal.from_table("sig", "s", sig_mc, ["energy"], 0, src_s,
                            1000.0, fields, [obs], [], [syst])
    bkg = Signal.from_table("bkg", "b", bkg_mc, ["energy"], 0, src_b,
                            2000.0, fields, [obs], [], [])
    stack = PdfStack([sig, bkg], [obs], [syst])
    if not stack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("stack should support the fused path")
    nevents = 3000
    data = np.stack([rng.uniform(5, 15, nevents).astype(np.float32),
                     np.zeros(nevents, np.float32)], axis=1)
    stack.set_data(data)
    st = NLLStatic(
        nexpected=np.asarray([1000.0, 2000.0], np.float32),
        n_mc=np.asarray([n_mc, n_mc], np.float32),
        source_id=np.asarray([0, 1], np.int32),
        means=np.asarray([1.0, 1.0, 0.0], np.float32),
        sigmas=np.asarray([0.0, 0.1, 0.05], np.float32),
        nsources=2)
    rb = stack._read_bins
    dd = stack.device_data

    def check(rb, *dd):
        diff = jnp.float32(0)
        for pv in ([1.1, 0.9, 0.02], [0.7, 1.4, -0.04]):
            params = jnp.asarray(pv, jnp.float32)
            f_hi, f_lo = stack.fused_nll_pair(params, rb, dd, st)
            lut, norms = stack.evaluate(params[2:], rb, dd)
            u_hi, u_lo = nll_pair(params, lut, norms, st)
            d = jnp.abs((f_hi - u_hi) + (f_lo - u_lo))
            diff = jnp.maximum(diff, d / jnp.maximum(jnp.abs(u_hi), 1.0))
        # Batched == single, bitwise.
        pb = jnp.asarray([[1.1, 0.9, 0.02], [0.7, 1.4, -0.04]],
                         jnp.float32)
        b_hi, b_lo = stack.fused_nll_pair(pb, rb, dd, st)
        s_hi, s_lo = stack.fused_nll_pair(pb[0], rb, dd, st)
        bd = jnp.abs(b_hi[0] - s_hi) + jnp.abs(b_lo[0] - s_lo)
        return diff + jnp.where(bd > 5e-6 * jnp.abs(s_hi), jnp.inf, 0.0)

    _run(check, rb, *dd, atol=2e-6)


@case("binned_nll_mix")
def smoke_binned_nll():
    """binned_nll_pair on the real TPU: the masked mixture must not
    SIGABRT the backend (the fenced-einsum hazard of nll_pair applies
    to the wide-mix branch) and must keep f32 precision (TPU default
    matmul precision would demote to bf16).  Checked by the exact
    regrouping identity: binned NLL == unbinned NLL on the same events
    for both the unrolled (<=32 signals) and einsum (>32) branches."""
    import jax.numpy as jnp

    from sxmc_tpu.ops.nll import NLLStatic, binned_nll_pair, nll_pair

    rng = np.random.default_rng(9)
    diff_cases = []
    for nsig in (4, 40):
        nbins, nev = 200, 50_000
        hists = rng.integers(1, 2000, (nsig, nbins)).astype(np.float32)
        norms = hists.sum(axis=1)
        bv = 1.0 / nbins
        ids = rng.integers(0, nbins, nev).astype(np.int32)
        st = NLLStatic(
            nexpected=np.full(nsig, 100.0, np.float32),
            n_mc=norms.copy(),
            source_id=np.arange(nsig, dtype=np.int32),
            means=np.ones(nsig, np.float32),
            sigmas=np.full(nsig, 0.3, np.float32),
            nsources=nsig)
        pars = (1.0 + rng.uniform(-0.2, 0.2, nsig)).astype(np.float32)
        ds_mask = np.ones((1, nsig), np.float32)
        diff_cases.append((nsig, jnp.asarray(hists), jnp.asarray(norms),
                           jnp.asarray(ids), jnp.asarray(pars), st, bv,
                           ds_mask))

    def check(*flat):
        diff = jnp.float32(0)
        i = 0
        for (nsig, _, _, _, _, st, bv, ds_mask) in diff_cases:
            hists, norms, ids, pars = flat[i:i + 4]
            i += 4
            lut = hists[:, :] / (norms[:, None] * bv)
            lut = lut[:, ids]
            u_hi, u_lo = nll_pair(pars, lut, norms, st)
            counts = jnp.zeros((1, hists.shape[1]), jnp.float32
                               ).at[0, ids].add(1.0)
            b_hi, b_lo = binned_nll_pair(pars, hists, norms, st, counts,
                                         ds_mask, bv)
            d = jnp.abs((u_hi - b_hi) + (u_lo - b_lo))
            scale = jnp.maximum(jnp.abs(u_hi), 1.0)
            diff = jnp.maximum(diff, d / scale)
        return diff

    flat = []
    for (_, hists, norms, ids, pars, _, _, _) in diff_cases:
        flat += [hists, norms, ids, pars]
    _run(check, *flat, atol=5e-6)


@case("fused_segment")
def smoke_fused_segment():
    """The whole-segment kernel on hardware: a 16-step Metropolis walk
    run as ONE launch must reproduce the trajectory of 16 sequential
    one-shot fused_nll_pair launches under the same log-space accept
    (both compiled into the SAME jitted program, one readback)."""
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.mcmc import metropolis
    from sxmc_tpu.ops.nll import NLLStatic
    from sxmc_tpu.pdf.stack import PdfStack
    from sxmc_tpu.signal import Observable, Signal, Source, Systematic

    rng = np.random.default_rng(21)
    obs = Observable(name="energy", field="energy", bins=100, lower=5.0,
                     upper=15.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.05],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    n_mc = 100_000
    sig_mc = rng.normal(10, 1, (n_mc, 1)).astype(np.float32)
    bkg_mc = rng.uniform(5, 15, (n_mc, 1)).astype(np.float32)
    src_s = Source(name="sig", index=0, mean=1.0)
    src_b = Source(name="bkg", index=1, mean=1.0, sigma=0.1)
    sig = Signal.from_table("sig", "s", sig_mc, ["energy"], 0, src_s,
                            1000.0, fields, [obs], [], [syst])
    bkg = Signal.from_table("bkg", "b", bkg_mc, ["energy"], 0, src_b,
                            2000.0, fields, [obs], [], [])
    stack = PdfStack([sig, bkg], [obs], [syst])
    if not stack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("stack should support the fused path")
    nevents = 2000
    data = np.stack([rng.uniform(5, 15, nevents).astype(np.float32),
                     np.zeros(nevents, np.float32)], axis=1)
    stack.set_data(data)
    st = NLLStatic(
        nexpected=np.asarray([1000.0, 2000.0], np.float32),
        n_mc=np.asarray([n_mc, n_mc], np.float32),
        source_id=np.asarray([0, 1], np.int32),
        means=np.asarray([1.0, 1.0, 0.0], np.float32),
        sigmas=np.asarray([0.0, 0.1, 0.05], np.float32),
        nsources=2)
    rb = stack._read_bins
    dd = stack.device_data
    nsteps = 16
    noise, u = metropolis._presample(
        jax.random.split(jax.random.PRNGKey(9), nsteps), 3, 0)
    noise = jnp.asarray(noise[:, 0, :])
    log_u = jnp.log(jnp.asarray(u[:, 0]))
    p0 = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    width = jnp.asarray([0.05, 0.05, 0.01], jnp.float32)

    tril = jnp.asarray([[0.04, 0.0, 0.0],
                        [-0.02, 0.03, 0.0],
                        [0.0, 0.0, 0.01]], jnp.float32)

    def check(noise, log_u, p0, width, tril, rb, *dd):
        nll0 = stack.fused_nll_pair(p0, rb, dd, st)

        def walk(proposal):
            samples, nlls, accs = stack.fused_segment(
                p0, nll0, proposal, rb, dd, noise, log_u, st)
            params = p0
            cur_hi, cur_lo = nll0
            ref = []
            for s in range(nsteps):
                if proposal.ndim == 2:
                    prop = params + proposal @ noise[s]
                else:
                    nz = noise[s] * jnp.maximum(proposal, 0.0)
                    prop = jnp.where(proposal > 0, params + nz, params)
                hi, lo = stack.fused_nll_pair(prop, rb, dd, st)
                delta = (cur_hi - hi) + (cur_lo - lo)
                a = (delta > 0) | (log_u[s] <= delta)
                params = jnp.where(a, prop, params)
                cur_hi = jnp.where(a, hi, cur_hi)
                cur_lo = jnp.where(a, lo, cur_lo)
                ref.append(params)
            return jnp.max(jnp.abs(samples - jnp.stack(ref)))

        return jnp.maximum(walk(width), walk(tril))

    _run(check, noise, log_u, p0, width, tril, rb, *dd, atol=1e-5)


def _fused_stack_fixture(seed, n_mc=100_000, nevents=1500):
    """Shared 2-signal fused-eligible stack for the batched cases."""
    from sxmc_tpu.ops.nll import NLLStatic
    from sxmc_tpu.pdf.stack import PdfStack
    from sxmc_tpu.signal import Observable, Signal, Source, Systematic

    rng = np.random.default_rng(seed)
    obs = Observable(name="energy", field="energy", bins=100, lower=5.0,
                     upper=15.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.05],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    sig_mc = rng.normal(10, 1, (n_mc, 1)).astype(np.float32)
    bkg_mc = rng.uniform(5, 15, (n_mc, 1)).astype(np.float32)
    src_s = Source(name="sig", index=0, mean=1.0)
    src_b = Source(name="bkg", index=1, mean=1.0, sigma=0.1)
    sig = Signal.from_table("sig", "s", sig_mc, ["energy"], 0, src_s,
                            1000.0, fields, [obs], [], [syst])
    bkg = Signal.from_table("bkg", "b", bkg_mc, ["energy"], 0, src_b,
                            2000.0, fields, [obs], [], [])
    stack = PdfStack([sig, bkg], [obs], [syst])
    st = NLLStatic(
        nexpected=np.asarray([1000.0, 2000.0], np.float32),
        n_mc=np.asarray([n_mc, n_mc], np.float32),
        source_id=np.asarray([0, 1], np.int32),
        means=np.asarray([1.0, 1.0, 0.0], np.float32),
        sigmas=np.asarray([0.0, 0.1, 0.05], np.float32),
        nsources=2)
    data = np.stack([rng.uniform(5, 15, nevents).astype(np.float32),
                     np.zeros(nevents, np.float32)], axis=1)
    return stack, st, data, rng


@case("fused_segment_blocked")
def smoke_fused_segment_blocked():
    """The blocked Metropolis-within-Gibbs whole-segment kernel on
    hardware (r5): per cycle one systematic-block rebuild + M
    rate-block decisions against the carried current histogram (a
    VMEM copy on systematic accept).  The 8-cycle walk must match a
    step-by-step blocked drive of the one-shot fused kernel under the
    log-space accept (same jit, one readback) — rate-move NLLs agree
    because a rate move leaves the systematics (hence the rebuilt
    histogram) unchanged."""
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.mcmc import metropolis

    stack, st, data, rng = _fused_stack_fixture(37, n_mc=100_000,
                                                nevents=1500)
    if not stack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("stack should support the fused path")
    stack.set_data(data)
    rb = stack._read_bins
    dd = stack.device_data
    nsteps, m, npar = 8, 3, 3
    noise, u = metropolis._presample(
        jax.random.split(jax.random.PRNGKey(13), nsteps), npar, m)
    noise = jnp.asarray(noise)          # (nsteps, m+1, npar)
    log_u = jnp.log(jnp.asarray(u))     # (nsteps, m+1)
    p0 = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    width = jnp.asarray([0.05, 0.05, 0.01], jnp.float32)
    rate_sel = np.arange(npar) < 2

    def check(noise, log_u, p0, width, rb, *dd):
        nll0 = stack.fused_nll_pair(p0, rb, dd, st)
        samples, nlls, accs = stack.fused_segment_blocked(
            p0, nll0, width, rb, dd, noise, log_u, st, m)
        params = p0
        cur_hi, cur_lo = nll0
        ref = []
        for s in range(nsteps):
            for sub in range(m + 1):
                mask = jnp.asarray(rate_sel if sub > 0
                                   else ~rate_sel)
                nz = noise[s, sub] * jnp.maximum(width, 0.0)
                prop = jnp.where((width > 0) & mask, params + nz,
                                 params)
                hi, lo = stack.fused_nll_pair(prop, rb, dd, st)
                delta = (cur_hi - hi) + (cur_lo - lo)
                a = (delta > 0) | (log_u[s, sub] <= delta)
                params = jnp.where(a, prop, params)
                cur_hi = jnp.where(a, hi, cur_hi)
                cur_lo = jnp.where(a, lo, cur_lo)
            ref.append(params)
        return jnp.max(jnp.abs(samples - jnp.stack(ref)))

    _run(check, noise, log_u, p0, width, rb, *dd, atol=1e-5)


@case("fused_segment_tempered_beta")
def smoke_fused_segment_tempered_beta():
    """Per-chain beta annealing of the in-kernel accept (the tempered
    ladder's whole-segment path, r5): a 3-replica batched segment with
    betas (1, 0.5, 0.25) must match a step-by-step one-shot drive
    with the beta-scaled log accept, per replica."""
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.mcmc import metropolis

    stack, st, data, rng = _fused_stack_fixture(41, n_mc=100_000,
                                                nevents=1500)
    if not stack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("stack should support the fused path")
    stack.set_data(data)
    rb = stack._read_bins
    dd = stack.device_data
    nch, nsteps, npar = 3, 10, 3
    betas = jnp.asarray([1.0, 0.5, 0.25], jnp.float32)
    noise = rng.normal(size=(nsteps, nch, npar)).astype(np.float32)
    log_u = np.log(rng.uniform(size=(nsteps, nch)).astype(np.float32))
    params0 = np.tile(np.asarray([1.0, 1.0, 0.0], np.float32),
                      (nch, 1))
    width = np.tile(np.asarray([0.08, 0.08, 0.02], np.float32),
                    (nch, 1))

    def check(noise, log_u, params0, width, betas, rb, *dd):
        hi, lo = stack.fused_nll_pair(params0, rb, dd, st)
        samples, nlls, accs = stack.fused_segment(
            params0, (hi, lo), width, rb, dd, noise, log_u, st,
            beta=betas)
        params = params0
        cur_hi, cur_lo = hi, lo
        ref = []
        for s in range(nsteps):
            nz = noise[s] * jnp.maximum(width, 0.0)
            prop = jnp.where(width > 0, params + nz, params)
            phi, plo = stack.fused_nll_pair(prop, rb, dd, st)
            delta = betas * ((cur_hi - phi) + (cur_lo - plo))
            a = (delta > 0) | (log_u[s] <= delta)
            params = jnp.where(a[:, None], prop, params)
            cur_hi = jnp.where(a, phi, cur_hi)
            cur_lo = jnp.where(a, plo, cur_lo)
            ref.append(params)
        return jnp.max(jnp.abs(samples - jnp.stack(ref)))

    _run(check, jnp.asarray(noise), jnp.asarray(log_u),
         jnp.asarray(params0), jnp.asarray(width), betas, rb, *dd,
         atol=1e-5)


@case("fused_step_weighted")
def smoke_fused_step_weighted():
    """Weighted MC through the fused kernels on hardware (r5): the
    fused NLL uses the in-kernel compensated norm accumulator,
    agreeing with the split weighted path's hists.sum() norm to
    f32-association scale (< 0.02 absolute on this fixture; bin-value
    equality is pinned in interpret mode by test_fused_step); and the
    weighted whole-segment kernel's trajectory must match a
    step-by-step drive of the weighted one-shot kernel (both
    kernel-normed -> comparable to ulp)."""
    import jax
    import jax.numpy as jnp

    from sxmc_tpu.mcmc import metropolis
    from sxmc_tpu.ops.nll import nll_pair

    stack, st, data, rng = _fused_stack_fixture(31, n_mc=100_000,
                                                nevents=1500)
    # Re-fixture with weights on both signals (dynamic + static).
    from sxmc_tpu.pdf.stack import PdfStack
    from sxmc_tpu.signal import Observable, Signal, Source, Systematic

    obs = Observable(name="energy", field="energy", bins=100, lower=5.0,
                     upper=15.0, field_index=0)
    syst = Systematic(name="shift", type=0, observable_field="energy",
                      means=[0.0], sigmas=[0.05],
                      observable_field_index=0, pidx=[0])
    fields = ["energy", "DATASET"]
    n_mc = 100_000
    sig_mc = rng.normal(10, 1, (n_mc, 1)).astype(np.float32)
    bkg_mc = rng.uniform(5, 15, (n_mc, 1)).astype(np.float32)
    src_s = Source(name="sig", index=0, mean=1.0)
    src_b = Source(name="bkg", index=1, mean=1.0, sigma=0.1)
    sig = Signal.from_table("sig", "s", sig_mc, ["energy"], 0, src_s,
                            1000.0, fields, [obs], [], [syst])
    bkg = Signal.from_table("bkg", "b", bkg_mc, ["energy"], 0, src_b,
                            2000.0, fields, [obs], [], [])
    sig.histogram.weights = rng.uniform(0.5, 2.0, n_mc).astype(
        np.float32)
    bkg.histogram.weights = rng.uniform(0.2, 3.0, n_mc).astype(
        np.float32)
    wstack = PdfStack([sig, bkg], [obs], [syst])
    if not wstack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("weighted stack should support fused")
    assert wstack.has_weights
    wstack.set_data(data)
    rb = wstack._read_bins
    dd = wstack.device_data
    nsteps = 8
    noise, u = metropolis._presample(
        jax.random.split(jax.random.PRNGKey(9), nsteps), 3, 0)
    noise = jnp.asarray(noise[:, 0, :])
    log_u = jnp.log(jnp.asarray(u[:, 0]))
    p0 = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)
    width = jnp.asarray([0.05, 0.05, 0.01], jnp.float32)

    def check(noise, log_u, p0, width, rb, *dd):
        theta = p0[2:]
        # Split path: weighted segmented histogram + evaluate + pair.
        lut, norms = wstack.evaluate(theta, rb, dd)
        s_hi, s_lo = nll_pair(p0, lut, norms, wstack._smoke_st)
        f_hi, f_lo = wstack.fused_nll_pair(p0, rb, dd,
                                           wstack._smoke_st)
        nll_diff = jnp.abs((f_hi + f_lo) - (s_hi + s_lo))

        # Whole-segment trajectory vs one-shot drive (kernel norms
        # both sides).
        nll0 = (f_hi, f_lo)
        samples, nlls, accs = wstack.fused_segment(
            p0, nll0, width, rb, dd, noise, log_u, wstack._smoke_st)
        params = p0
        cur_hi, cur_lo = nll0
        ref = []
        for s in range(nsteps):
            nz = noise[s] * jnp.maximum(width, 0.0)
            prop = jnp.where(width > 0, params + nz, params)
            hi, lo = wstack.fused_nll_pair(prop, rb, dd,
                                           wstack._smoke_st)
            delta = (cur_hi - hi) + (cur_lo - lo)
            a = (delta > 0) | (log_u[s] <= delta)
            params = jnp.where(a, prop, params)
            cur_hi = jnp.where(a, hi, cur_hi)
            cur_lo = jnp.where(a, lo, cur_lo)
            ref.append(params)
        walk_diff = jnp.max(jnp.abs(samples - jnp.stack(ref)))
        return jnp.maximum(
            jnp.maximum(jnp.float32(0.0), nll_diff - 0.02),
            walk_diff)

    from sxmc_tpu.ops.nll import NLLStatic

    wstack._smoke_st = NLLStatic(
        nexpected=np.asarray([1000.0, 2000.0], np.float32),
        n_mc=np.asarray([n_mc, n_mc], np.float32),
        source_id=np.asarray([0, 1], np.int32),
        means=np.asarray([1.0, 1.0, 0.0], np.float32),
        sigmas=np.asarray([0.0, 0.1, 0.05], np.float32),
        nsources=2)
    _run(check, noise, log_u, p0, width, rb, *dd, atol=1e-5)


@case("fused_segment_grouped_shardmap")
def smoke_fused_segment_grouped_shardmap():
    """The experiment-grouped batched whole-segment kernel INSIDE a
    shard_map body on a 1-device TPU mesh — the exact Mosaic
    combination every pod shard runs in the fused sharded ensemble
    (parallel.ensemble._batched_segment_fused).  Each (exp, chain)
    trajectory must equal a standalone single-chain segment launch
    with that experiment's read bins (same jit, one readback)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    stack, st, data, rng = _fused_stack_fixture(23)
    if not stack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("stack should support the fused path")
    nexp, cpe, nsteps, npar = 2, 2, 10, 3
    # Two experiments with different event subsets -> different rb.
    batch = np.stack([data, np.concatenate(
        [data[200:], np.tile(data[:1], (200, 1))])])
    batch[1, -200:, 1] = -999.0  # pad rows, unknown tag
    rb = stack.compute_read_bins(batch)  # (nexp, nsig, nev)
    dd = stack.device_data

    noise = rng.normal(size=(nsteps, nexp, cpe, npar)).astype(
        np.float32)
    log_u = np.log(rng.uniform(size=(nsteps, nexp, cpe)).astype(
        np.float32))
    params0 = np.tile(np.asarray([1.0, 1.0, 0.0], np.float32),
                      (nexp, cpe, 1))
    params0 += rng.uniform(-0.04, 0.04, params0.shape).astype(
        np.float32)
    width = np.tile(np.asarray([0.05, 0.05, 0.01], np.float32),
                    (nexp, cpe, 1))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                axis_names=("exp", "chain"))

    def check(params0, width, noise, log_u, rb, *dd):
        nll0_hi = []
        nll0_lo = []
        for e in range(nexp):
            h, l = stack.fused_nll_pair(params0[e], rb[e], dd, st)
            nll0_hi.append(h)
            nll0_lo.append(l)
        nll0_hi = jnp.stack(nll0_hi)
        nll0_lo = jnp.stack(nll0_lo)

        def body(params_l, hi_l, lo_l, width_l, noise_l, logu_l, rb_l,
                 *dd_l):
            s, n, a = stack.fused_segment(
                params_l, (hi_l, lo_l), width_l, rb_l, dd_l,
                noise_l, logu_l, st)
            return s, n

        with mesh:
            got_s, got_n = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("exp", "chain"), P("exp", "chain"),
                          P("exp", "chain"), P("exp", "chain"),
                          P(None, "exp", "chain"),
                          P(None, "exp", "chain"), P("exp"), P()),
                out_specs=(P(None, "exp", "chain"),
                           P(None, "exp", "chain")),
                check_vma=False)(
                    params0, nll0_hi, nll0_lo, width, noise, log_u,
                    rb, *dd)

        diff = jnp.float32(0.0)
        for e in range(nexp):
            for c in range(cpe):
                s1, n1, _ = stack.fused_segment(
                    params0[e, c], (nll0_hi[e, c], nll0_lo[e, c]),
                    width[e, c], rb[e], dd, noise[:, e, c],
                    log_u[:, e, c], st)
                diff = jnp.maximum(diff, jnp.max(jnp.abs(
                    got_s[:, e, c] - s1)))
                diff = jnp.maximum(diff, jnp.max(jnp.abs(
                    got_n[:, e, c] - n1)))
        return diff

    _run(check, jnp.asarray(params0), jnp.asarray(width),
         jnp.asarray(noise), jnp.asarray(log_u), rb, *dd)


@case("fused_segment_fullcov_batched")
def smoke_fused_segment_fullcov_batched():
    """Batched per-chain-tril proposals through the whole-segment
    kernel (the native form multi-chain full_cov uses,
    metropolis._run_chains_fullcov_batched): each chain must match a
    standalone single-chain tril launch bit-for-bit."""
    import jax.numpy as jnp

    stack, st, data, rng = _fused_stack_fixture(29)
    if not stack.supports_fused:
        if INTERPRET:
            print("  (skipped: CPU stack has no pallas path)",
                  file=sys.stderr)
            return
        raise AssertionError("stack should support the fused path")
    stack.set_data(data)
    rb = stack._read_bins
    dd = stack.device_data
    nch, nsteps, npar = 2, 12, 3
    noise = rng.normal(size=(nsteps, nch, npar)).astype(np.float32)
    log_u = np.log(rng.uniform(size=(nsteps, nch)).astype(np.float32))
    params0 = np.tile(np.asarray([1.0, 1.0, 0.0], np.float32),
                      (nch, 1))
    params0[1, 1] = 1.1
    trils = np.zeros((nch, npar, npar), np.float32)
    trils[0] = [[0.04, 0.0, 0.0], [-0.02, 0.03, 0.0], [0.0, 0.0, 0.01]]
    trils[1] = [[0.02, 0.0, 0.0], [0.01, 0.05, 0.0], [0.0, 0.01, 0.02]]

    def check(params0, trils, noise, log_u, rb, *dd):
        hi, lo = stack.fused_nll_pair(params0, rb, dd, st)
        got_s, got_n, _ = stack.fused_segment(
            params0, (hi, lo), trils, rb, dd, noise, log_u, st)
        diff = jnp.float32(0.0)
        for c in range(nch):
            s1, n1, _ = stack.fused_segment(
                params0[c], (hi[c], lo[c]), trils[c], rb, dd,
                noise[:, c], log_u[:, c], st)
            diff = jnp.maximum(diff, jnp.max(jnp.abs(got_s[:, c] - s1)))
            diff = jnp.maximum(diff, jnp.max(jnp.abs(got_n[:, c] - n1)))
        return diff

    _run(check, jnp.asarray(params0), jnp.asarray(trils),
         jnp.asarray(noise), jnp.asarray(log_u), rb, *dd)


def main():
    import jax

    print(f"smoke_tpu: backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    failures = 0
    for name, fn in CASES:
        try:
            fn()
            print(f"PASS {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
    if failures:
        sys.exit(1)
    print(f"smoke_tpu: all {len(CASES)} cases passed")


if __name__ == "__main__":
    main()
