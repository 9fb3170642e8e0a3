"""The scaling benchmark's stability statistics (tools/bench_scaling.py).

The N-vs-4N artifact is the north rule's headline, so the logic that
accepts or refuses a block is itself pinned: the range spread is only
the retry TRIGGER; the VERDICT on a retried 5+ sample is the
interquartile spread, because contention shifts a quartile while a
single lucky fast rep (which contention cannot cause) does not. Both
historical cases the criterion was validated on are frozen here.
"""
import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))

from bench_scaling import iqr_spread, restat, spread  # noqa: E402

# round-4, known-contended (external tenant, load 5-8): every rep after
# the first slower than the last — a shifted run, not an outlier
CONTENDED = [3079.6, 2786.2, 2427.3, 2283.2, 2312.6]
# round-5 idle box: four reps in a tight 5400-6000 band + one fast rep
# (a faster rep cannot be caused by contention)
ONE_FAST_REP = [5414.6, 5760.2, 7113.3, 5831.1, 6003.1]


def test_iqr_flags_contended_block():
    assert iqr_spread(CONTENDED) > 0.15
    assert spread(CONTENDED) > 0.15  # range agrees here


def test_iqr_passes_one_fast_rep():
    assert iqr_spread(ONE_FAST_REP) < 0.15
    assert spread(ONE_FAST_REP) > 0.15  # range CANNOT separate this case


def test_restat_small_sample_uses_range():
    b = {"runs_turns_per_sec": [1749.0, 1636.2, 1847.3]}
    restat(b, 0.15)
    assert b["turns_per_sec"] == 1749.0
    assert b["unstable"] is False
    assert "iqr_spread_pct" not in b
    b2 = {"runs_turns_per_sec": [1749.0, 1200.0, 1847.3]}
    restat(b2, 0.15)
    assert b2["unstable"] is True


def test_restat_large_sample_uses_iqr():
    b = {"runs_turns_per_sec": list(ONE_FAST_REP)}
    restat(b, 0.15)
    assert b["unstable"] is False
    assert b["iqr_spread_pct"] == pytest.approx(0.042, abs=0.002)
    b2 = {"runs_turns_per_sec": list(CONTENDED)}
    restat(b2, 0.15)
    assert b2["unstable"] is True


def test_restat_never_alters_raw_reps():
    raw = list(ONE_FAST_REP)
    b = {"runs_turns_per_sec": raw}
    restat(b, 0.15)
    assert b["runs_turns_per_sec"] == ONE_FAST_REP
    # median comes from the raw sample, not a trimmed one
    assert b["turns_per_sec"] == 5831.1
