"""Multi-replica serving runner: routing, health, failover.

Round-2 infrastructure item from ROADMAP (new design — the reference
has no serving runtime; SURVEY.md §5 calls for failure detection at
serving scale). One ``ServingEngine`` per data-parallel replica (on a
pod: one per host group, each engine's params sharded over its own
submesh; in tests: several engines on one process), fronted by a
router:

- **routing**: least-loaded healthy replica (active slots + queued);
- **health**: a replica is demoted when its step raises or when an
  external monitor (``parallel.multihost.HeartbeatMonitor``) calls
  ``mark_unhealthy``;
- **failover**: requests in flight on a demoted replica are re-queued
  from their original prompts onto healthy replicas — generation
  restarts (at-least-once semantics; emitted tokens from the dead
  replica are discarded so each request's final output is exactly one
  replica's clean run).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np

from torchao_tpu.serving.engine import Request, ServingEngine


@dataclasses.dataclass
class ReplicaState:
    engine: ServingEngine
    healthy: bool = True
    # cluster request-id -> the replica-local Request object
    inflight: Dict[int, Request] = dataclasses.field(default_factory=dict)


class ServingCluster:
    def __init__(self, engines: List[ServingEngine]):
        assert engines, "need at least one replica"
        self.replicas = [ReplicaState(e) for e in engines]
        self._next_id = 0
        self.completed: Dict[int, Request] = {}
        # original submissions for failover replay
        self._submitted: Dict[int, Request] = {}
        self._assignment: Dict[int, int] = {}  # cluster id -> replica idx

    # ------------------------------------------------------------------
    def _load(self, r: ReplicaState) -> int:
        return len(r.engine.active) + len(r.engine.queue)

    def healthy_replicas(self) -> List[int]:
        return [i for i, r in enumerate(self.replicas) if r.healthy]

    def submit(self, req: Request) -> int:
        """Route to the least-loaded healthy replica; returns the
        cluster-wide request id."""
        cid = self._next_id
        self._next_id += 1
        self._submitted[cid] = req
        self._dispatch(cid, req)
        return cid

    def _dispatch(self, cid: int, req: Request):
        healthy = self.healthy_replicas()
        if not healthy:
            raise RuntimeError("no healthy replicas")
        idx = min(healthy, key=lambda i: self._load(self.replicas[i]))
        r = self.replicas[idx]
        local = Request(
            prompt=np.asarray(req.prompt),
            max_new_tokens=req.max_new_tokens,
            eos_id=req.eos_id,
        )
        r.engine.add_request(local)
        r.inflight[cid] = local
        self._assignment[cid] = idx

    # ------------------------------------------------------------------
    def mark_unhealthy(self, idx: int, reason: str = ""):
        """Demote a replica (heartbeat callback target) and re-route its
        in-flight + queued work."""
        r = self.replicas[idx]
        if not r.healthy:
            return
        r.healthy = False
        moved = list(r.inflight.items())
        r.inflight.clear()
        for cid, _dead in moved:
            self._dispatch(cid, self._submitted[cid])

    def heartbeat_callback(self, idx: int):
        """``on_failure`` hook for a per-replica HeartbeatMonitor."""
        return lambda reason: self.mark_unhealthy(idx, reason)

    # ------------------------------------------------------------------
    def step(self, n: int = 8) -> List[int]:
        """Drive every healthy replica ``n`` device steps; returns the
        cluster ids completed this round."""
        done: List[int] = []
        for idx, r in enumerate(self.replicas):
            if not r.healthy:
                continue
            try:
                r.engine.step_n(n)
            except Exception:
                self.mark_unhealthy(idx, "step raised")
                continue
            finished = {id(x): x for x in r.engine.completed}
            if not finished:
                continue
            for cid, local in list(r.inflight.items()):
                if id(local) in finished:
                    self.completed[cid] = local
                    del r.inflight[cid]
                    done.append(cid)
            r.engine.completed.clear()
        return done

    def run_to_completion(self, n: int = 8, max_rounds: int = 10000):
        for _ in range(max_rounds):
            if len(self.completed) == len(self._submitted):
                break
            self.step(n)
        return self.completed
