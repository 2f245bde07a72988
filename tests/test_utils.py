"""Profiling/observability utility tests (SURVEY §5 tracing parity)."""
import logging
import time

import jax.numpy as jnp

from realtrace_tpu.utils import profiling


def test_frame_timer_rolls_window():
    t = profiling.FrameTimer(window=0.01)
    rolled = False
    for _ in range(50):
        rolled |= t.frame(1000.0)
        time.sleep(0.001)
    assert rolled
    assert t.fps > 0
    assert "fps" in t.title() and "Mrays" in t.title()


def test_timed_returns_mean_and_result():
    f = lambda x: x * 2
    dt, out = profiling.timed(jnp.asarray, 3.0, repeats=2)
    assert dt >= 0
    assert float(out) == 3.0


def test_frame_bracket_and_log_transfer(caplog):
    with profiling.frame_bracket("test_frame"):
        pass
    with caplog.at_level(logging.INFO, logger="realtrace_tpu"):
        profiling.log_transfer("scene", {"a": jnp.zeros((4, 3))})
    assert any("scene" in r.message for r in caplog.records)
