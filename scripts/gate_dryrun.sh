#!/bin/bash
# Turn-key gate dry-run (VERDICT r4 next #10): eval --fake-weights,
# the HF checkpoint CLI end-to-end on a synthetic checkpoint, the SAM2
# checkpoint CLI suite, and the lm-eval stub protocol — all on CPU.
set -e
cd "$(dirname "$0")/.."
exec python scripts/gate_dryrun.py "$@"
