"""CompeteSMoE flip-schedule generator tests."""

import pytest
import numpy as np

from competesmoe_tpu.moe.schedule import (
    balanced_flip_row,
    build_flip_schedule,
    schedule_from_dict,
    schedule_to_dict,
)

pytestmark = pytest.mark.fast



def test_deterministic_across_calls():
    a = build_flip_schedule(4, 1000, 0.1, 0.07, 2, seed=123)
    b = build_flip_schedule(4, 1000, 0.1, 0.07, 2, seed=123)
    np.testing.assert_array_equal(a.flips, b.flips)
    assert a.step_warm == 100 and a.flip_steps == 900


def test_rate_approximately_respected():
    s = build_flip_schedule(1, 20000, 0.0, 0.05, 3, seed=0)
    rate = s.flips.mean()
    assert 0.04 < rate < 0.06


def test_max_compete_budget_respected_across_layers():
    n_layers, total, rate, cap = 16, 2000, 0.07, 2
    s = build_flip_schedule(n_layers, total, 0.0, rate, cap, seed=7)
    per_step = s.flips.sum(axis=0)
    assert per_step.max() <= cap


def test_shift_rebalancing_preserves_count_when_space():
    # With a saturated current step the candidate must move, not vanish.
    rng = np.random.default_rng(0)
    flip_steps, cap = 50, 1
    cum = np.zeros(flip_steps, dtype=np.int64)
    cum[10:40] = 1  # already at budget in the middle
    row = balanced_flip_row(rng, flip_steps, 0.5, cap, cum)
    # No overlapping placements beyond budget
    assert ((cum + row) <= cap).all()


def test_roundtrip_serialization():
    s = build_flip_schedule(3, 500, 0.05, 0.06, 2, seed=42)
    s2 = schedule_from_dict(schedule_to_dict(s))
    np.testing.assert_array_equal(s.flips, s2.flips)
    assert s2.step_warm == s.step_warm


def test_is_flip_indexing():
    s = build_flip_schedule(2, 100, 0.1, 0.5, 2, seed=1)
    assert not s.is_flip(0, 5)  # warm-up
    step = 10 + int(np.argmax(s.flips[0]))
    assert s.is_flip(0, step) == bool(s.flips[0, step - 10])
