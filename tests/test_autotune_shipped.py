"""The SHIPPED autotune verdicts (sxmc_tpu/data/autotune_v5e.json).

VERDICT r4 item 2: the cache the autotune docstring promises must
actually exist, be loaded by load_cache(), and drive tuned_chunk() for
the bench shapes — so fresh environments start from measured verdicts
instead of bare heuristics (the reference self-tunes at first eval,
pdfz.cpp:622-814; here the sweep is recorded once per hardware
generation and shipped).
"""

import json
import os

from sxmc_tpu.ops import autotune


def test_shipped_file_exists_and_is_wellformed():
    p = autotune.shipped_path()
    assert os.path.exists(p), (
        "sxmc_tpu/data/autotune_v5e.json missing — run "
        "`python -m sxmc_tpu.ops.autotune --record` on the TPU "
        "and commit the verdicts")
    with open(p) as f:
        shipped = json.load(f)
    assert shipped, "shipped cache is empty"
    for key, rec in shipped.items():
        kind, total_nbins, nseg, bucket = key.split(":")
        assert kind in ("global", "segmented"), key
        assert int(total_nbins) > 0 and int(nseg) > 0
        assert isinstance(rec, dict) and "chunk" in rec, (key, rec)
        assert rec["chunk"] >= 1024
        # Every verdict records the measurement that justified it.
        assert rec.get("seconds", 0) > 0, (key, rec)


def test_load_cache_surfaces_shipped(monkeypatch, tmp_path):
    # With no user cache, load_cache() must return the shipped
    # verdicts verbatim.
    monkeypatch.setenv(autotune._CACHE_ENV,
                       str(tmp_path / "nonexistent.json"))
    with open(autotune.shipped_path()) as f:
        shipped = json.load(f)
    cache = autotune.load_cache()
    for k, v in shipped.items():
        assert cache[k] == v


def test_tuned_chunk_uses_shipped_bench_shape(monkeypatch, tmp_path):
    """The 29-signal group bench shape resolves to the recorded
    chunk (not the bare heuristic default marker)."""
    monkeypatch.setenv(autotune._CACHE_ENV,
                       str(tmp_path / "nonexistent.json"))
    with open(autotune.shipped_path()) as f:
        shipped = json.load(f)
    seg_keys = [k for k in shipped if k.startswith("segmented:")]
    assert seg_keys, "no segmented verdict shipped"
    kind, total_nbins, nseg, bucket = seg_keys[0].split(":")
    got = autotune.tuned_chunk(kind, int(total_nbins), int(nseg),
                               int(bucket), default=-1)
    assert got == shipped[seg_keys[0]]["chunk"] != -1


def test_user_cache_overrides_shipped(monkeypatch, tmp_path):
    user = tmp_path / "user.json"
    with open(autotune.shipped_path()) as f:
        shipped = json.load(f)
    key = sorted(shipped)[0]
    json.dump({key: {"chunk": 2048}}, open(user, "w"))
    monkeypatch.setenv(autotune._CACHE_ENV, str(user))
    cache = autotune.load_cache()
    assert cache[key]["chunk"] == 2048
