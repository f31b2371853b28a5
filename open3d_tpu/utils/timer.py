"""Wall-clock timers (reference: utility/Timer.h — Timer:15, ScopeTimer:36,
FPSTimer:45). On TPU these time host-visible spans; callers must block on
device results (jax.block_until_ready) for meaningful kernel timings.
"""

from __future__ import annotations

import time

from open3d_tpu.utils.logging import log_info


class Timer:
    def __init__(self):
        self._start = None
        self._elapsed_ms = 0.0
        self.start()

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> float:
        if self._start is not None:
            self._elapsed_ms = (time.perf_counter() - self._start) * 1e3
            self._start = None
        return self._elapsed_ms

    def elapsed_ms(self) -> float:
        if self._start is not None:
            return (time.perf_counter() - self._start) * 1e3
        return self._elapsed_ms


class ScopeTimer(Timer):
    """Context manager that logs elapsed time on exit."""

    def __init__(self, name: str = "scope"):
        self.name = name
        super().__init__()

    def __enter__(self):
        self.start()
        return self

    def __exit__(self, *exc):
        log_info("{} took {:.2f} ms", self.name, self.stop())
        return False


class FPSTimer:
    """Periodically reports frames/s (reference: FPSTimer prints every ~1s)."""

    def __init__(self, name: str = "fps", report_every_s: float = 1.0):
        self.name = name
        self.report_every_s = report_every_s
        self._count = 0
        self._t0 = time.perf_counter()

    def signal(self) -> float | None:
        """Count one frame; returns fps if a report was emitted."""
        self._count += 1
        now = time.perf_counter()
        dt = now - self._t0
        if dt >= self.report_every_s:
            fps = self._count / dt
            log_info("{}: {:.1f} fps", self.name, fps)
            self._count = 0
            self._t0 = now
            return fps
        return None
