"""Shared-memory IPC, timestamp alignment, fake camera/env/perception."""

import multiprocessing as mp
import time
from multiprocessing.managers import SharedMemoryManager
from queue import Empty, Full

import numpy as np
import pytest

from gsdx.realworld.shared_memory import (
    SharedAtomicCounter,
    SharedMemoryQueue,
    SharedMemoryRingBuffer,
)
from gsdx.realworld.timestamps import (
    TimestampObsAccumulator,
    get_accumulate_timestamp_idxs,
)


@pytest.fixture
def shm():
    m = SharedMemoryManager()
    m.start()
    yield m
    m.shutdown()


def test_atomic_counter(shm):
    c = SharedAtomicCounter(shm)
    assert c.load() == 0
    c.add(5)
    c.add(3)
    assert c.load() == 8
    c.store(42)
    assert c.load() == 42


def _worker_add(counter, n):
    for _ in range(n):
        counter.add(1)


def test_atomic_counter_cross_process(shm):
    c = SharedAtomicCounter(shm)
    procs = [mp.Process(target=_worker_add, args=(c, 500)) for _ in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    assert c.load() == 2000  # lock-free increments must not be lost


def test_ring_buffer_filo(shm):
    rb = SharedMemoryRingBuffer.create_from_examples(
        shm, {"x": np.zeros((4,), np.float32), "t": 0.0},
        get_max_k=4, get_time_budget=0.2, put_desired_frequency=1000,
    )
    for i in range(10):
        rb.put({"x": np.full((4,), i, np.float32), "t": float(i)})
    out = rb.get()
    assert out["x"][0] == 9.0
    last3 = rb.get_last_k(3)
    np.testing.assert_array_equal(last3["x"][:, 0], [7, 8, 9])
    assert rb.count == 10


def test_ring_buffer_wraparound(shm):
    rb = SharedMemoryRingBuffer.create_from_examples(
        shm, {"x": 0.0}, get_max_k=3, get_time_budget=0.001,
        put_desired_frequency=2000,
    )
    n = rb.buffer_size + 2  # force wrap
    for i in range(n):
        rb.put({"x": float(i)})
    out = rb.get_last_k(3)
    np.testing.assert_array_equal(out["x"], [n - 3, n - 2, n - 1])


def test_queue_fifo(shm):
    q = SharedMemoryQueue.create_from_examples(
        shm, {"cmd": 0, "value": 0.0}, buffer_size=4)
    assert q.empty()
    with pytest.raises(Empty):
        q.get()
    for i in range(4):
        q.put({"cmd": i, "value": i * 0.5})
    with pytest.raises(Full):
        q.put({"cmd": 9, "value": 9.0})
    first = q.get()
    assert first["cmd"] == 0
    rest = q.get_all()
    np.testing.assert_array_equal(rest["cmd"], [1, 2, 3])
    assert q.empty()


def test_timestamp_binning():
    # 10 Hz bins; frames at ~30 Hz -> every 3rd frame selected
    ts = [0.01 + 0.0333 * i for i in range(30)]
    local, global_, nxt = get_accumulate_timestamp_idxs(ts, 0.0, 0.1)
    assert global_ == list(range(len(global_)))  # contiguous bins
    assert nxt == len(global_)
    # dropped frames repeat: single late frame fills all elapsed bins
    local2, global2, _ = get_accumulate_timestamp_idxs([0.55], 0.0, 0.1,
                                                       next_global_idx=0)
    assert global2 == [0, 1, 2, 3, 4, 5]
    assert local2 == [0] * 6


def test_obs_accumulator():
    acc = TimestampObsAccumulator(start_time=0.0, dt=0.1)
    acc.put({"v": np.arange(5, dtype=np.float32)},
            np.array([0.05, 0.15, 0.25, 0.27, 0.55]))
    # bins 0,1,2 filled by frames 0,1,2; frame 3 dropped (same bin), frame 4
    # fills bins 3,4,5
    assert len(acc) == 6
    np.testing.assert_array_equal(acc.data["v"], [0, 1, 2, 4, 4, 4])


def test_fake_camera_process():
    from gsdx.realworld.cameras import MultiCamera, SyntheticSource

    rig = MultiCamera([SyntheticSource(width=64, height=48, fps=60)],
                      put_fps=30)
    try:
        rig.start()
        time.sleep(0.5)
        obs = rig.get()
        assert obs[0]["color"].shape == (48, 64, 3)
        assert obs[0]["depth"].shape == (48, 64)
        k = rig.get_intrinsics()[0]
        assert k.shape == (3, 3)
    finally:
        rig.stop()


@pytest.mark.slow
def test_fake_env_and_perception(rng):
    from gsdx.realworld.env import FakeEnv, FakeEnvConfig
    from gsdx.realworld.perception import PerceptionModule

    pts = rng.normal(scale=0.03, size=(200, 3)).astype(np.float32)
    pts += np.array([0.3, 0.05, 0.0], np.float32)
    cols = np.tile(np.array([0.9, 0.2, 0.1], np.float32), (200, 1))
    env = FakeEnv(pts, cols, FakeEnvConfig(n_cameras=2, width=160, height=120))
    env.start()
    obs = env.get_obs(get_depth=True)
    assert obs["color"].shape == (2, 120, 160, 3)

    pm = PerceptionModule(voxel_size=0.01, max_points=4096)
    fused, fused_cols = pm.get_tabletop_points_env(env)
    assert len(fused) > 20
    # fused cloud must sit near the true object
    d = np.linalg.norm(fused.mean(0) - pts.mean(0))
    assert d < 0.1, f"fused centroid off by {d}"

    # pushing moves the particles toward the push direction
    before = env.get_state_points().mean(0)
    env.step(np.array([0.3, 0.05, 0.45, 0.05]))
    after = env.get_state_points().mean(0)
    assert after[0] > before[0] + 0.005
