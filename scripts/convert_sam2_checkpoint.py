"""Convert a reference SAM2 checkpoint (.pt) to the torchao_tpu pytree.

Turn-key CLI over :mod:`torchao_tpu.models.sam2_convert` — the moment a
real SAM2 checkpoint file (e.g. ``sam2.1_hiera_base_plus.pt``) can be
dropped into this environment, this script converts it (name mapping +
layout transposes, all numerically verified against the importable
reference modules in ``tests/test_sam2_convert.py``) and saves an ``.npz``
of flat dotted keys that :func:`load_params` reassembles.

Usage:
  python scripts/convert_sam2_checkpoint.py --checkpoint <sam2.pt> \
      --out <out.npz> [--strict]

The released checkpoints store the weights under a ``model`` key; both
nested and flat state dicts are accepted. ``--strict`` fails if any
checkpoint key is left unmapped (sam2.1 architectures map completely).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        items = None
    if items is None:
        if tree is None:
            # explicit sentinel so load_params round-trips None leaves
            # (bias-less linears, out_proj when out_dim == in_dim) —
            # dropping them made load_params KeyError (ADVICE r4)
            out[prefix.rstrip(".") + "#none"] = np.zeros((), np.int8)
        elif hasattr(tree, "shape"):
            out[prefix.rstrip(".")] = np.asarray(tree)
        else:  # e.g. the per-attention "heads" int
            out[prefix.rstrip(".") + "#static"] = np.asarray(tree)
        return out
    for k, v in items:
        out.update(_flatten(v, f"{prefix}{k}."))
    return out


def load_params(npz_path: str):
    """Reassemble the nested params pytree from a converted ``.npz``."""
    import jax.numpy as jnp

    flat = np.load(npz_path)
    tree: dict = {}
    for key in flat.files:
        static = key.endswith("#static")
        none = key.endswith("#none")
        parts = (
            key.removesuffix("#static").removesuffix("#none").split(".")
        )
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        v = flat[key]
        if none:
            node[parts[-1]] = None
        elif static:
            from torchao_tpu.models.sam2_modeling import StaticInt

            node[parts[-1]] = StaticInt(int(v))
        else:
            node[parts[-1]] = jnp.asarray(v)

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--strict", action="store_true")
    a = ap.parse_args()

    import torch

    from torchao_tpu.models.sam2_convert import convert_sam2_checkpoint
    from torchao_tpu.models.sam2_modeling import SAM2Config

    sd = torch.load(a.checkpoint, map_location="cpu", weights_only=True)
    if "model" in sd:
        sd = sd["model"]
    params, unconsumed = convert_sam2_checkpoint(
        sd, SAM2Config.reference_base()
    )
    if unconsumed:
        msg = f"{len(unconsumed)} unmapped checkpoint keys: " + ", ".join(
            unconsumed[:8]
        )
        if a.strict:
            raise SystemExit(msg)
        print("WARNING:", msg)
    flat = _flatten(params)
    np.savez(a.out, **flat)
    n_arr = sum(1 for k in flat if not k.endswith("#static"))
    print(f"wrote {a.out}: {n_arr} arrays, "
          f"{sum(v.size for v in flat.values()):,} params")


if __name__ == "__main__":
    main()
