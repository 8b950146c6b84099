"""Pipelined asynchronous predictor.

The reference demo's AsyncPredictor spawns one CUDA worker process per GPU
with task/result queues (demo/predictor.py:132-219).  Under single-controller
JAX the same latency-hiding comes for free from asynchronous dispatch: a
background thread prepares inputs (decode/pad) while the device queue drains
previously submitted programs.  This class gives the identical put/get API.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from .pipeline import Predictor


class _WorkerError:
    __slots__ = ("exc",)

    def __init__(self, exc: BaseException):
        self.exc = exc


class AsyncPredictor:
    def __init__(self, predictor: Predictor, depth: int = 4):
        self.predictor = predictor
        self._tasks: queue.Queue = queue.Queue(maxsize=depth)
        self._results: queue.Queue = queue.Queue()
        self._n_submitted = 0
        self._n_collected = 0
        self._thread = threading.Thread(target=self._work, daemon=True)
        self._thread.start()

    def _work(self):
        while True:
            idx, image = self._tasks.get()
            if image is None:
                break
            # enqueue the device program; the result is an async device array.
            # Worker exceptions (odd input, transient device error) are
            # forwarded to the consumer instead of silently killing the
            # thread, which would leave get() blocked forever (same pattern
            # as data.loader.Prefetcher).
            try:
                probs = self.predictor.probs_sliding(image)
            except BaseException as e:  # noqa: BLE001 — forwarded, not swallowed
                self._results.put((idx, _WorkerError(e)))
                return
            self._results.put((idx, probs))

    def put(self, image: np.ndarray) -> int:
        idx = self._n_submitted
        self._tasks.put((idx, image))
        self._n_submitted += 1
        return idx

    def get(self):
        """(index, (640,640,T) device probs) in submission order not guaranteed."""
        self._n_collected += 1
        idx, item = self._results.get()
        if isinstance(item, _WorkerError):
            raise item.exc
        return idx, item

    def __len__(self):
        return self._n_submitted - self._n_collected

    def shutdown(self):
        self._tasks.put((-1, None))
