from gsdx.realworld.shared_memory import (
    ArraySpec,
    SharedAtomicCounter,
    SharedMemoryQueue,
    SharedMemoryRingBuffer,
    SharedNDArray,
)
from gsdx.realworld.env import Env, FakeEnv
from gsdx.realworld.timestamps import (
    TimestampActionAccumulator,
    TimestampObsAccumulator,
    align_timestamps,
    get_accumulate_timestamp_idxs,
)

__all__ = [
    "ArraySpec",
    "SharedAtomicCounter",
    "SharedMemoryQueue",
    "SharedMemoryRingBuffer",
    "SharedNDArray",
    "Env",
    "FakeEnv",
    "TimestampActionAccumulator",
    "TimestampObsAccumulator",
    "align_timestamps",
    "get_accumulate_timestamp_idxs",
]
