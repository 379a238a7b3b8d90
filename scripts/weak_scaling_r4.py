"""Weak-scaling proxy at real-model widths (VERDICT r3 #3a).

Extends the round-3 TP efficiency trend (0.20/0.40/0.77 at
dim-per-device 256/512/1024) to 2048 and 4096 — the real Llama-3-8B
per-device width at TP=1 — on the 8-virtual-device CPU mesh. The
harness is parallel.evidence.tp_decode_evidence: identical total
compute unsharded vs TP-sharded on the same silicon, so the ratio
isolates partitioning+collective overhead; the north-star gate is
>= 0.85 at 4096.

Run AFTER the test suite (shared cores pollute the timing).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)


def main():
    from torchao_tpu.parallel.evidence import tp_decode_evidence

    trend = []
    for dim in (1024, 2048, 4096):
        ev = tp_decode_evidence(8, steps=8, dim=dim)
        row = {
            "dim_per_device": dim,
            "tp_efficiency": ev["tp_timing"]["tp_efficiency"],
            "unsharded_ms": ev["tp_timing"]["scaled_unsharded_step_ms"],
            "tp_ms": ev["tp_timing"]["scaled_tp_step_ms"],
            "reductions": ev["hlo"]["reduction_collectives"],
        }
        trend.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"weak_scaling_trend": trend}), flush=True)


if __name__ == "__main__":
    main()
