"""Unit tests for bench.py's phase-robust resident-timing estimator.

The tunneled backend's d2h latency has minutes-long degraded phases
(CLAUDE.md "Environment quirks"), so the HBM-resident rate is measured
as the DIFFERENCE of two dispatch windows ending in an identical
closing fetch. These tests drive `time_device_resident` with a fake
clock and scripted close costs and assert the estimator recovers the
true chip rate under every realistic phase pattern — and only ever
UNDER-estimates when the phases are unrecoverable.
"""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402

PER_REP = 0.010  # simulated chip time per rep (seconds)
SAMPLES = 1_000_000  # per rep -> true rate 100.0 Msamples/s
TRUE_RATE = SAMPLES / PER_REP / 1e6


@pytest.fixture
def sim(monkeypatch):
    """Fake clock + scripted close costs for time_device_resident."""
    state = {"t": 0.0, "closes": []}
    monkeypatch.setattr(bench.time, "perf_counter", lambda: state["t"])
    monkeypatch.setattr(
        bench, "_probe_outputs",
        lambda outs: state.update(t=state["t"] + state["closes"].pop(0)))

    def prog(*args):
        state["t"] += PER_REP
        return "out"

    def run(closes, seconds=3.0, max_reps=60):
        state["t"] = 0.0
        state["closes"] = list(closes)
        return bench.time_device_resident(
            [(prog, ())], SAMPLES, seconds, max_reps=max_reps)

    return run


# Close-cost scripts are consumed in order: warm-up window, window A,
# window B, then (on a rejected decomposition) remeasured A, window B.

def test_clean_phase_recovers_true_rate(sim):
    rate, reps = sim([0.01, 0.01, 0.01])
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_stable_stall_cancels_in_the_difference(sim):
    # A 120 s close on EVERY window: the single-window rate would read
    # ~0.3 Ms/s; the two-window difference cancels it exactly.
    rate, reps = sim([120.0, 120.0, 120.0])
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_stall_beginning_at_first_window(sim):
    rate, _ = sim([0.01, 120.0, 120.0])
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_phase_shift_between_windows_retries(sim):
    # Stall starts between A and B: the implied close cost goes
    # negative, A is remeasured in the new phase, second B accepted.
    rate, _ = sim([0.01, 0.01, 120.0, 120.0, 120.0])
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_phase_recovery_between_windows_retries(sim):
    # Stall ENDS between A and B (per-rep slope would be negative).
    rate, _ = sim([0.01, 120.0, 0.01, 0.01, 0.01])
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_chaotic_phases_underestimate_never_inflate(sim):
    # Every close different: no self-consistent decomposition exists.
    # The fallback bills the close to the reps -- conservative.
    rate, _ = sim([5.0, 40.0, 90.0, 20.0, 70.0])
    assert 0 < rate < TRUE_RATE


def test_slow_chip_caps_second_window(sim):
    # When window A alone exceeds the budget, window B must not grow to
    # max_reps (the close is not the problem; the chip is).
    rate, reps = sim([0.01] * 3, seconds=0.1, max_reps=60)
    assert reps == 2 * max(60 // 3, 1)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_pathological_stall_skips_retry(sim):
    # A 700 s close appearing at window B would normally trigger a
    # retry, but the two windows already blew past the 600 s bound --
    # only 3 closes are scripted, so a retry would IndexError.
    rate, _ = sim([0.01, 0.01, 700.0])
    assert 0 < rate < TRUE_RATE


def test_single_rep_budget_returns_whole_window(sim):
    rate, reps = sim([0.01, 0.01, 0.01], max_reps=1)
    assert reps == 1
    assert 0 < rate <= TRUE_RATE
