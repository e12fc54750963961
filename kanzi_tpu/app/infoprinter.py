"""InfoPrinter: verbosity-driven per-block event reporting.

Mirrors the reference listener (v2/app/InfoPrinter.go): at verbosity >= 4 it
correlates the 4 per-block timestamps (before/after transform,
before/after entropy) and prints a latency/size line per block in order; at
verbosity >= 5 it prints raw JSON events.
"""

from __future__ import annotations

import sys
import threading
import time

from ..core import Event, EventType, Listener


class InfoPrinter(Listener):
    def __init__(self, verbosity: int, start_type: EventType,
                 out=None):
        self.verbosity = verbosity
        self.out = out or sys.stderr
        if start_type == EventType.COMPRESSION_START:
            self.types = (EventType.BEFORE_TRANSFORM, EventType.AFTER_TRANSFORM,
                          EventType.BEFORE_ENTROPY, EventType.AFTER_ENTROPY)
        else:
            self.types = (EventType.BEFORE_ENTROPY, EventType.AFTER_ENTROPY,
                          EventType.BEFORE_TRANSFORM, EventType.AFTER_TRANSFORM)
        self._lock = threading.Lock()
        self._pending: dict[int, list] = {}

    def process_event(self, evt: Event) -> None:
        if self.verbosity >= 5:
            print(str(evt), file=self.out)
        if self.verbosity < 4 or evt.type not in self.types:
            return
        with self._lock:
            slot = self._pending.setdefault(evt.block_id, [None] * 4)
            idx = self.types.index(evt.type)
            slot[idx] = (evt.size, evt.time or time.time())
            if all(s is not None for s in slot):
                del self._pending[evt.block_id]
                (s0, t0), (s1, t1), (s2, t2), (s3, t3) = slot
                d1 = 1000 * (t1 - t0)
                d2 = 1000 * (t3 - t2)
                ratio = s3 / s0 if s0 else 0.0
                print(f"Block {evt.block_id}: {s0} => {s1} [{d1:.0f} ms] => "
                      f"{s3} [{d2:.0f} ms] ({100 * ratio:.2f}%)", file=self.out)
