"""Multi-host runtime helpers: initialization + failure detection.

The reference has no multi-host runtime of its own (SURVEY.md §2.10 —
everything rides torch.distributed). For pod-scale TPU serving this
module provides the minimum new design (SURVEY.md §5): ``initialize()``
wraps ``jax.distributed``, and a heartbeat monitor detects dead hosts —
each host bumps a counter in a tiny all-reduce; a host that stops
participating stalls the collective and the watchdog flags it.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed (no-op if single-process)."""
    if num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    return jax.process_index() == 0


@dataclasses.dataclass
class HeartbeatMonitor:
    """Periodic cross-host liveness check.

    Every ``interval_s`` each process contributes 1 to a psum over all
    devices; if the result is short, or the collective itself exceeds
    ``timeout_s``, ``on_failure`` fires. Run ``start()`` on every host.
    """

    interval_s: float = 10.0
    timeout_s: float = 30.0
    on_failure: Optional[Callable[[str], None]] = None
    _stop: threading.Event = dataclasses.field(
        default_factory=threading.Event
    )
    _thread: Optional[threading.Thread] = None
    last_ok: float = 0.0

    def _beat_once(self) -> bool:
        """One liveness round: a cross-process allgather of each host's
        process index must return every index. A dead host stalls or
        truncates the collective."""
        if jax.process_count() == 1:
            # single host: device liveness only
            ones = jnp.ones((jax.local_device_count(),), jnp.int32)
            return int(jnp.sum(ones)) == jax.local_device_count()
        from jax.experimental import multihost_utils

        mine = np.asarray([jax.process_index()], np.int32)
        got = multihost_utils.process_allgather(mine)
        return sorted(np.asarray(got).ravel().tolist()) == list(
            range(jax.process_count())
        )

    def _loop(self):
        while not self._stop.is_set():
            t0 = time.time()
            ok = False
            try:
                ok = self._beat_once()
            except Exception as e:  # collective failed → host loss
                if self.on_failure:
                    self.on_failure(f"heartbeat error: {e}")
            dt = time.time() - t0
            if ok and dt <= self.timeout_s:
                self.last_ok = time.time()
            elif self.on_failure:
                self.on_failure(
                    f"heartbeat degraded: ok={ok} latency={dt:.1f}s"
                )
            self._stop.wait(self.interval_s)

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
