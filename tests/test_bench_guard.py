"""The bench.py silent-perf-regression guard (round-2 postmortem: a
2.5x flagship regression shipped because slow runs were misattributed
to VM contention)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (
    perf_regression_warning,
    prior_round_best,
    prior_round_median,
)


def test_warns_on_planted_regression_with_clean_probe():
    # flagship 3x slower, probe unchanged -> code regression, must warn
    w = perf_regression_warning(300.0, 100.0, 2.0, 2.0)
    assert w is not None and "PERF REGRESSION" in w


def test_visible_suppression_when_probe_shows_contention():
    # flagship 3x slower but the pure-Catalyst probe is ALSO 3x slower
    # -> VM contention, not a code change: no accusation, but the
    # suppression itself must be VISIBLE (round-4 advice: a silent
    # guard can stay suppressed across every contended window forever)
    w = perf_regression_warning(300.0, 100.0, 6.0, 2.0)
    assert w is not None and "PERF REGRESSION" not in w and "suppressed" in w


def test_silent_within_band_and_without_history():
    assert perf_regression_warning(140.0, 100.0, 2.0, 2.0) is None
    assert perf_regression_warning(1000.0, None, 2.0, 2.0) is None


def test_suppressed_when_cpu_probe_shows_core_theft():
    # round-4 postmortem: a co-tenant stealing cores slows the NARROW
    # q1 probe only ~1.5x while slowing the core-saturating flagship
    # ~3x — q1 alone would read clean and the guard would accuse the
    # code. The wide cpu_probe sees the theft (3x here) -> suppressed,
    # with the suppression stated rather than silent.
    w = perf_regression_warning(
        300.0, 100.0, 2.9, 2.0, cpu_probe_sec=9.0, cpu_probe_ref=3.0
    )
    assert w is not None and "PERF REGRESSION" not in w and "suppressed" in w
    # both probes clean -> still warns
    w = perf_regression_warning(
        300.0, 100.0, 2.0, 2.0, cpu_probe_sec=3.1, cpu_probe_ref=3.0
    )
    assert w is not None and "PERF REGRESSION" in w
    # no prior cpu_probe recorded (older rounds) -> old behavior
    w = perf_regression_warning(
        300.0, 100.0, 2.0, 2.0, cpu_probe_sec=9.0, cpu_probe_ref=None
    )
    assert w is not None


def test_prior_round_best_cpus_matched(tmp_path):
    # cpu_probe does FIXED work: seconds scale with 1/cores, so only
    # same-cpus records are comparable (driver puts cpus at top level)
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {"cpus": 32, "parsed": {"queries": {}, "cpu_probe_sec": 3.0}}
        )
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"cpus": 8, "parsed": {"queries": {}, "cpu_probe_sec": 12.0}})
    )
    assert prior_round_best(str(tmp_path), "cpu_probe_sec", cpus=32) == 3.0
    assert prior_round_best(str(tmp_path), "cpu_probe_sec", cpus=8) == 12.0
    assert prior_round_best(str(tmp_path), "cpu_probe_sec") == 3.0


def test_prior_round_best_reads_bench_files(tmp_path):
    for i, t in enumerate([123.4, 304.8]):
        (tmp_path / f"BENCH_r{i:02d}.json").write_text(
            json.dumps({"queries": {"tile_pipeline": t, "q1_pricing_summary": 2.0 + i}})
        )
    assert prior_round_best(str(tmp_path), "tile_pipeline") == 123.4
    assert prior_round_best(str(tmp_path), "q1_pricing_summary") == 2.0
    assert prior_round_best(str(tmp_path), "missing") is None


def test_prior_round_best_reads_driver_nested_format(tmp_path):
    # the driver's BENCH_r*.json wraps the bench line under 'parsed'
    # (r3 ADVICE: the flat-only reader silently returned None against
    # every committed file, disarming the guard)
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {
                "n": 3,
                "rc": 0,
                "tail": "...",
                "parsed": {
                    "queries": {"tile_pipeline": 150.0, "q1_pricing_summary": 1.7},
                    "n_docs": 50000,
                },
            }
        )
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps(
            {"parsed": {"queries": {"tile_pipeline": 99.0}, "n_docs": 200000}}
        )
    )
    assert prior_round_best(str(tmp_path), "tile_pipeline") == 99.0
    assert prior_round_best(str(tmp_path), "q1_pricing_summary") == 1.7
    # n_docs-matched comparison: only same-input records count
    assert prior_round_best(str(tmp_path), "tile_pipeline", n_docs=50000) == 150.0
    assert prior_round_best(str(tmp_path), "tile_pipeline", n_docs=500000) is None


def test_prior_round_median_tracks_typical_window(tmp_path):
    # the cpu_probe reference must be the MEDIAN of prior rounds: with
    # ~3x ambient co-tenant noise, the all-time MIN (one quiet window
    # ever) makes cpu_factor=1.3 read almost every real window as
    # dirty, suppressing the guard indefinitely
    for i, t in enumerate([2.0, 5.9, 6.1]):
        (tmp_path / f"BENCH_r{i:02d}.json").write_text(
            json.dumps({"cpus": 32, "parsed": {"queries": {}, "cpu_probe_sec": t}})
        )
    assert prior_round_best(str(tmp_path), "cpu_probe_sec", cpus=32) == 2.0
    assert prior_round_median(str(tmp_path), "cpu_probe_sec", cpus=32) == 5.9
    # a typical 6s window compared against the 5.9 median is CLEAN
    # (guard armed); against the 2.0 min it would read dirty forever
    w = perf_regression_warning(
        300.0, 100.0, 2.0, 2.0, cpu_probe_sec=6.0, cpu_probe_ref=5.9
    )
    assert w is not None and "PERF REGRESSION" in w


def test_guard_history_keyed_on_n_docs_not_rounds(tmp_path):
    # collapsing the bisection prefix changes rounds_per_level at a
    # fixed input size; the guard history must keep matching on
    # n_docs/cpus alone so a round-count change neither misfires the
    # guard nor hides prior-round history
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "queries": {"tile_pipeline": 120.0},
                    "n_docs": 50000,
                    "rounds_per_level": {"1": 8, "0": 1},
                }
            }
        )
    )
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps(
            {
                "parsed": {
                    "queries": {"tile_pipeline": 100.0},
                    "n_docs": 50000,
                    "rounds_per_level": {"1": 4, "0": 1},
                }
            }
        )
    )
    # both rounds' records are comparable history at the same n_docs
    assert prior_round_best(str(tmp_path), "tile_pipeline", n_docs=50000) == 100.0
    # a faster changed-rounds run must NOT warn...
    assert perf_regression_warning(90.0, 100.0, 2.0, 2.0) is None
    # ...and a genuinely slower one still does
    w = perf_regression_warning(160.0, 100.0, 2.0, 2.0)
    assert w is not None and "PERF REGRESSION" in w


def test_prior_round_best_reads_committed_files():
    # regression test against the REAL committed format, not synthetic
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not os.path.exists(os.path.join(repo, "BENCH_r03.json")):
        import pytest

        pytest.skip("no committed BENCH files in this checkout")
    best = prior_round_best(repo, "tile_pipeline", n_docs=50000)
    assert best is not None and 0 < best < 10_000
