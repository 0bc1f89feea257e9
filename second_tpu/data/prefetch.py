"""Host->device prefetch pipeline.

The reference overlaps host work with GPU compute via DataLoader
worker processes only (train.py:262-270); the final convert+upload
still ran serially with the step. Here a background thread performs
example conversion and the device transfer for the NEXT batch(es)
while the current train/eval step runs, so the accelerator never
waits on H2D (SURVEY hard-part: input pipeline feeding >100 fps).
"""

import queue as queue_mod
import threading


class DevicePrefetcher:
    """Iterate ``prep_fn(item)`` for items of ``iterable``, prepared
    ``depth`` batches ahead in a daemon thread.

    Exceptions from the source iterable or prep_fn propagate to the
    consumer at the point of ``__next__``.
    """

    _DONE = object()

    def __init__(self, iterable, prep_fn, depth=2):
        self._q = queue_mod.Queue(maxsize=max(int(depth), 1))
        self._thread = threading.Thread(
            target=self._run, args=(iter(iterable), prep_fn), daemon=True)
        self._thread.start()

    def _run(self, it, prep_fn):
        try:
            for item in it:
                self._q.put(("item", prep_fn(item)))
        except BaseException as exc:  # noqa: BLE001 - must cross threads
            self._q.put(("error", exc))
            return
        self._q.put(("done", self._DONE))

    def __iter__(self):
        while True:
            kind, payload = self._q.get()
            if kind == "error":
                raise payload
            if kind == "done":
                return
            yield payload
