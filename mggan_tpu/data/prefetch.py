"""Async host pipeline: overlap numpy batch assembly + augmentation feed
with device compute (the reference relies on torch DataLoader workers,
data_loaders.py:92-99; here a single background thread suffices because
batch assembly is vectorised numpy / native C++)."""

from __future__ import annotations

import queue
import threading


class Prefetcher:
    """Wrap any batch iterable; assembles up to ``depth`` batches ahead."""

    def __init__(self, iterable, depth: int = 2):
        self._it = iter(iterable)
        self._q = queue.Queue(maxsize=depth)
        self._done = object()
        self._err = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
