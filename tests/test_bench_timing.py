"""Unit tests for bench.py's phase-robust resident-timing estimator.

The tunneled backend's d2h latency has minutes-long degraded phases
(CLAUDE.md "Environment quirks"), so the HBM-resident rate is estimated
from the rep-count SLOPE of three dispatch windows ending in an
identical closing fetch, measured in non-monotone rep order (small,
large, mid) so a close cost drifting in time cannot masquerade as
per-rep chip time. These tests drive `time_device_resident` with a
fake clock and scripted close costs and assert the estimator recovers
the true chip rate under every realistic phase pattern — and only ever
errs DOWNWARD (or within the documented ~5% slope-agreement bound)
when the phases shift mid-measurement.

Close costs are consumed in measurement order: warm-up window, then
w(r1), w(r3), w(r2), then on a rejected decomposition the retry's
w(r1), w(r3), w(r2). Scripting exactly the closes a scenario needs
doubles as an assertion on HOW MANY windows run (an extra pop raises
IndexError).
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


def test_clean_phase_recovers_true_rate(sim):
    rate, reps = sim([0.01] * 4)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_stable_stall_cancels_in_the_slope(sim):
    # A 120 s close on EVERY window: the single-window rate would read
    # ~0.3 Ms/s; the rep-count slope cancels it exactly.
    rate, reps = sim([120.0] * 4)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_stall_from_first_measured_window(sim):
    rate, _ = sim([0.01, 120.0, 120.0, 120.0])
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_stall_onset_mid_measurement_retries(sim):
    # Stall starts after w(r1): slopes disagree wildly, all three
    # windows are remeasured in the (now stable) stalled phase.
    rate, _ = sim([0.01, 0.01] + [120.0] * 5)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_stall_recovery_mid_measurement_retries(sim):
    # Stall ENDS after w(r1): w(r1) carries a 120 s close the later
    # windows lack -- slopes go negative, retry measures all clean.
    rate, _ = sim([0.01, 120.0] + [0.01] * 5)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_moderate_favorable_shift_does_not_inflate(sim):
    # The round-4 review's inflation hole: a close that IMPROVES
    # 0.3 s -> 0.01 s between windows made the old two-window estimator
    # report 3.6x the true rate while passing its guards. The slope
    # test rejects it (s12 < 0) and the retry lands in the clean phase.
    rate, _ = sim([0.01, 0.3] + [0.01] * 5)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)
    assert rate <= TRUE_RATE * 1.05


def test_linear_close_drift_bounded_inflation(sim):
    # A close drifting linearly in TIME is indistinguishable from
    # per-rep chip time when windows run in rep order; the shuffled
    # (small, large, mid) order turns it into a slope disagreement.
    # Steep drift (0.16 s/window here) is rejected and remeasured once
    # the drift bottoms out; the residual shallow-drift acceptance is
    # bounded by the 30% slope-agreement rule to ~5% inflation.
    rate, _ = sim([0.66, 0.5, 0.34, 0.18, 0.02, 0.01, 0.01])
    assert 0.9 * TRUE_RATE <= rate <= 1.05 * TRUE_RATE


def test_chaotic_phases_underestimate_never_inflate(sim):
    # Every close different: no self-consistent decomposition exists.
    # The fallback bills the close to the reps -- conservative.
    rate, _ = sim([5.0, 40.0, 90.0, 20.0, 70.0, 55.0, 33.0])
    assert 0 < rate < TRUE_RATE


def test_slow_chip_caps_later_windows(sim):
    # When w(r1) alone exceeds the budget, the later windows must not
    # grow to max_reps (the close is not the problem; the chip is).
    rate, reps = sim([0.01] * 4, seconds=0.1, max_reps=60)
    assert reps == 2 * max(60 // 3, 1)
    assert rate == pytest.approx(TRUE_RATE, rel=0.01)


def test_pathological_stall_skips_retry(sim):
    # A 700 s close appearing after w(r1) would normally trigger a
    # retry, but the windows already blew past the 600 s bound -- only
    # 4 closes are scripted, so a retry would IndexError.
    rate, _ = sim([0.01, 0.01, 700.0, 700.0])
    assert 0 < rate < TRUE_RATE


def test_tiny_rep_budget_returns_whole_window(sim):
    # max_reps < 3 cannot form three distinct windows: one window, the
    # conservative whole-window rate.
    rate, reps = sim([0.01, 0.01], max_reps=1)
    assert reps == 1
    assert 0 < rate <= TRUE_RATE
