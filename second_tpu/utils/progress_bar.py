"""Console progress bar (reference second/utils/progress_bar.py)."""

import sys
import time


def progress_str(val, *, width=20, with_ptg=True):
    val = max(0.0, min(val, 1.0))
    filled = int(width * val)
    bar = "#" * filled + "-" * (width - filled)
    if with_ptg:
        return f"[{bar}]{val * 100:3.0f}%"
    return f"[{bar}]"


class ProgressBar:
    def __init__(self, width=20, with_ptg=True, step_time_average=50):
        self._width = width
        self._with_ptg = with_ptg
        self._step_time_average = step_time_average
        self._total = None

    def start(self, total):
        self._total = total
        self._i = 0
        self._times = []
        self._last = time.time()

    def print_bar(self, finished_size=1):
        self._i += finished_size
        now = time.time()
        self._times.append(now - self._last)
        self._last = now
        self._times = self._times[-self._step_time_average:]
        avg = sum(self._times) / len(self._times)
        remain = avg * (self._total - self._i)
        bar = progress_str(self._i / self._total, width=self._width,
                           with_ptg=self._with_ptg)
        print(f"\r{bar} {avg:.3f}s/it, eta {remain:.0f}s ", end="")
        sys.stdout.flush()
        if self._i >= self._total:
            print()


def prog_bar(iterable, total=None, **kw):
    total = total if total is not None else len(iterable)
    bar = ProgressBar(**kw)
    bar.start(total)
    for item in iterable:
        yield item
        bar.print_bar()
