"""Timing utilities (reference second/utils/timer.py + the named-region
timers baked into voxelnet.py:191-228; here measurement wraps jax
dispatch with block_until_ready so device work is included)."""

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def simple_timer(name=""):
    t = time.time()
    yield
    print(f"{name} exec time: {time.time() - t}")


class ModelTimer:
    """Named-region accumulator (reference start_timer/end_timer)."""

    def __init__(self, enabled=True):
        self._enabled = enabled
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)
        self._starts = {}

    def start(self, name):
        if self._enabled:
            self._starts[name] = time.perf_counter()

    def end(self, name, sync_value=None):
        if not self._enabled:
            return
        if sync_value is not None:
            # a host transfer, not block_until_ready: the latter is a
            # no-op on the tunneled axon TPU backend (see README timing
            # note), so transferring a scalar is the only honest sync
            import jax
            import numpy as np

            np.asarray(jax.device_get(sync_value))
        self._totals[name] += time.perf_counter() - self._starts.pop(name)
        self._counts[name] += 1

    @contextlib.contextmanager
    def scope(self, name, sync=None):
        self.start(name)
        yield
        self.end(name, sync)

    def get_avg_time_dict(self):
        return {
            k: self._totals[k] / max(self._counts[k], 1) for k in self._totals
        }

    def clear(self):
        self._totals.clear()
        self._counts.clear()
        self._starts.clear()
