"""Host-side frame prefetching (L5 ingest pipeline).

The reference decodes frames in a DataLoader worker process
(num_workers=1, Tracker.py:162) so image decode overlaps GPU compute.
Here a pool of daemon threads decodes up to `ahead` frames in advance —
cv2's imread/cvtColor/undistort and numpy's array kernels release the GIL,
so decode overlaps both the device work and (with workers > 1) itself.
The synthetic dataset's analytic renderer is the motivating heavy case
(~0.7 s/frame at 680x1200): it advertises `prefetch_workers` so benchmark
runs aren't bottlenecked on frame synthesis.

Sequential-access only (SLAM consumes frames in order); random access
falls through to the underlying reader.
"""

from __future__ import annotations

import threading
from typing import Any


class Prefetcher:
    """Wraps a frame reader with an `ahead`-deep, `workers`-wide
    background decode pool delivering frames in order."""

    def __init__(self, reader: Any, start: int = 0, ahead: int = 2,
                 workers: int = 1):
        self.reader = reader
        self.workers = max(1, int(workers))
        # depth must cover the pool, and Queue-like 0 would mean unbounded:
        # clamp so prefetch is always finite
        self.ahead = max(self.workers, max(1, int(ahead)))
        self._results: dict[int, tuple] = {}   # idx -> ('ok'|'err', value)
        self._cv = threading.Condition()
        self._next_issue = start
        self._next_consume = start
        self._stop = False
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(self.workers)]
        for t in self._threads:
            t.start()

    def __len__(self) -> int:
        return len(self.reader)

    def _worker(self) -> None:
        n = len(self.reader)
        while True:
            with self._cv:
                while (not self._stop and
                       (self._next_issue >= n
                        or self._next_issue - self._next_consume
                        >= self.ahead)):
                    self._cv.wait(timeout=0.5)
                if self._stop or self._next_issue >= n:
                    return
                idx = self._next_issue
                self._next_issue += 1
            try:
                item = ('ok', self.reader[idx])
            except Exception as e:          # surfaced on consume
                item = ('err', e)
            with self._cv:
                self._results[idx] = item
                self._cv.notify_all()

    def __getitem__(self, idx: int):
        if idx != self._next_consume:
            # random access: bypass the pool (keyframe re-reads etc.)
            return self.reader[idx]
        with self._cv:
            while idx not in self._results and not self._stop:
                self._cv.wait(timeout=0.5)
            if idx not in self._results:    # closed while waiting
                return self.reader[idx]
            status, value = self._results.pop(idx)
            self._next_consume = idx + 1
            self._cv.notify_all()
        if status == 'err':
            raise value
        return value

    def close(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        for t in self._threads:
            t.join(timeout=2.0)
