"""Host-side frame prefetching (L5 ingest pipeline).

The reference decodes frames in a DataLoader worker process
(num_workers=1, Tracker.py:162) so image decode overlaps GPU compute.
Here a daemon thread decodes up to `ahead` frames in advance into a
bounded queue — cv2's imread/cvtColor/undistort release the GIL, so the
decode genuinely overlaps the device work dispatched by the controller.

Sequential-access only (SLAM consumes frames in order); random access
falls through to the underlying reader.
"""

from __future__ import annotations

import queue
import threading
from typing import Any


class Prefetcher:
    """Wraps a frame reader with an `ahead`-deep background decode queue."""

    def __init__(self, reader: Any, start: int = 0, ahead: int = 2):
        self.reader = reader
        # Queue(maxsize=0) would be UNBOUNDED (decode the whole dataset
        # ahead); clamp so prefetch depth is always finite
        self.ahead = max(1, int(ahead))
        self._q: queue.Queue = queue.Queue(maxsize=self.ahead)
        self._next_produce = start
        self._next_consume = start
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def __len__(self) -> int:
        return len(self.reader)

    def _worker(self) -> None:
        try:
            for idx in range(self._next_produce, len(self.reader)):
                if self._stop.is_set():
                    return
                item = self.reader[idx]
                while not self._stop.is_set():
                    try:
                        self._q.put((idx, item), timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except Exception as e:                      # surfaced on consume
            self._q.put((-1, e))

    def __getitem__(self, idx: int):
        if idx != self._next_consume:
            # random access: bypass the queue (keyframe re-reads etc.)
            return self.reader[idx]
        got_idx, item = self._q.get()
        if got_idx == -1:
            raise item
        assert got_idx == idx, (got_idx, idx)
        self._next_consume = idx + 1
        return item

    def close(self) -> None:
        self._stop.set()
        try:  # drain so the worker's put() unblocks
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
