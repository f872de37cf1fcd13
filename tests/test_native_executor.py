"""Native executor core: lock-free buffer semantics + real-time ticker."""

import threading
import time

import numpy as np
import pytest

pytest.importorskip("ctypes")

from trajoptkp_tpu.mpc.native_executor import NativeControlBuffer, RtTicker


def test_buffer_publish_pop():
    buf = NativeControlBuffer(horizon=4, nu=2)
    assert buf.next_control() is None  # empty until first publish
    plan = np.arange(8, dtype=np.float64).reshape(4, 2)
    buf.publish(plan, start_index=1)
    np.testing.assert_allclose(buf.next_control(), [2, 3])
    np.testing.assert_allclose(buf.next_control(), [4, 5])
    np.testing.assert_allclose(buf.next_control(), [6, 7])
    assert buf.next_control() is None  # exhausted -> underrun
    assert buf.stats["underruns"] >= 1
    assert buf.stats["controls_consumed"] == 3


def test_buffer_republish_resets_index():
    buf = NativeControlBuffer(horizon=3, nu=1)
    buf.publish(np.array([[1.0], [2.0], [3.0]]), start_index=0)
    np.testing.assert_allclose(buf.next_control(), [1.0])
    buf.publish(np.array([[10.0], [20.0], [30.0]]), start_index=1)
    np.testing.assert_allclose(buf.next_control(), [20.0])
    assert buf.consumed() == 2


def test_buffer_concurrent_publish_pop():
    """Planner thread republishing while actor pops: no tearing (every pop
    is a row of SOME published plan)."""
    H, nu = 16, 3
    buf = NativeControlBuffer(H, nu)
    stop = threading.Event()

    def planner():
        gen = 1
        while not stop.is_set():
            plan = np.full((H, nu), float(gen))
            buf.publish(plan, start_index=0)
            gen += 1

    th = threading.Thread(target=planner, daemon=True)
    th.start()
    t0 = time.time()
    pops = 0
    while time.time() - t0 < 0.5:
        u = buf.next_control()
        if u is not None:
            # all components from the same plan generation
            assert u[0] == u[1] == u[2], u
            pops += 1
    stop.set()
    th.join(timeout=2)
    assert pops > 100


def test_ticker_paces():
    t = RtTicker(0.002)
    t0 = time.perf_counter()
    for _ in range(50):
        t.wait()
    elapsed = time.perf_counter() - t0
    assert 0.08 <= elapsed <= 0.25, elapsed  # 50 x 2 ms with slack
    assert t.ticks == 50
