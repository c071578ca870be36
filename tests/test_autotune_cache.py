"""Autotune cache: persisted chunk verdicts with 10% hysteresis.

The reference tunes launch configs at first eval and keeps a config
only on a >=10% improvement (reference: pdfz.cpp:622-814, 712-719);
here the sweep runs offline and its verdicts feed production through a
JSON cache (ops/autotune.py, consulted by PdfStack).
"""

import os

import pytest

from sxmc_tpu.ops import autotune


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    p = str(tmp_path / "autotune.json")
    monkeypatch.setenv("SXMC_TPU_AUTOTUNE_CACHE", p)
    # Isolate from the SHIPPED verdicts (sxmc_tpu/data/autotune_v5e
    # .json, covered by test_autotune_shipped.py): these tests pin the
    # cache MECHANICS on a bare environment.
    monkeypatch.setattr(autotune, "shipped_path",
                        lambda: str(tmp_path / "no_shipped.json"))
    return p


def test_default_without_cache(tmp_cache):
    assert autotune.tuned_chunk("segmented", 1000, 29, 4_900_000,
                                16384) == 16384


def test_record_and_lookup(tmp_cache):
    res = {8192: 1e-3, 16384: 8e-4, 32768: 6.5e-4}
    got = autotune.record_tuning("segmented", 1000, 29, 4_900_000, res,
                                 heuristic_chunk=16384)
    assert got == 32768
    assert os.path.exists(tmp_cache)
    assert autotune.tuned_chunk("segmented", 1000, 29, 4_900_000,
                                16384) == 32768
    # Sample counts in the same power-of-two bucket share the verdict.
    assert autotune.tuned_chunk("segmented", 1000, 29, 5_000_000,
                                16384) == 32768
    # Different shape: untouched.
    assert autotune.tuned_chunk("segmented", 1000, 2, 4_900_000,
                                16384) == 16384


def test_hysteresis_keeps_heuristic(tmp_cache):
    # Best is only 6% better than the heuristic: not recorded.
    res = {8192: 1e-3, 16384: 8e-4, 32768: 7.5e-4}
    assert autotune.record_tuning("x", 10, 1, 100, res,
                                  heuristic_chunk=16384) is None
    assert autotune.tuned_chunk("x", 10, 1, 100, 16384) == 16384


def test_corrupt_cache_is_ignored(tmp_cache):
    with open(tmp_cache, "w") as f:
        f.write("{not json")
    assert autotune.load_cache() == {}
    assert autotune.tuned_chunk("a", 1, 1, 1, 4096) == 4096
