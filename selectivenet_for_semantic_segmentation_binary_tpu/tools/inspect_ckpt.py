"""Checkpoint inspection tool (reference jupyters/check_net.ipynb cells 0-7).

The reference notebook inspects state-dict key sets and verifies that the
``module.`` prefix torch DataParallel injects strips cleanly so DP and bare
checkpoints interchange (net_utils.py:11-16). This CLI covers the same ground
for BOTH checkpoint formats this framework reads:

* native ``model_epoch{N}.ckpt`` (flax msgpack of the full train state), and
* reference ``model_epoch{N}.pth`` (torch ``{'net': state_dict, ...}``);

and adds what the notebook did by eyeball: a canonical key/shape comparison
between any two checkpoints. Native checkpoints are canonicalised through
``variables_to_torch_state_dict`` so a native/.pth pair compares in one naming
scheme — the reference's layer names (model.py:19-66).

Usage::

    python -m selectivenet_for_semantic_segmentation_binary_tpu.tools.inspect_ckpt \
        /model/1-fold/checkpoint/model_epoch200.ckpt [--keys] [--compare OTHER.pth]
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

import numpy as np

from ..utils.checkpoint import (
    _epoch_of,
    load_checkpoint,
    remove_module_prefix,
    variables_to_torch_state_dict,
)

_SELECTIVE_HEADS = ("conv_select", "conv_aux")


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict pytree into {'a/b/c': leaf} (numpy leaves)."""
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _load_torch_net(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    return {k: np.asarray(v) for k, v in net.items()}


def canonical_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Either format -> reference-named (model.py) state dict, module.-stripped."""
    if path.endswith(".pth"):
        return remove_module_prefix(_load_torch_net(path))
    net = load_checkpoint(path)["net"]
    return variables_to_torch_state_dict(net)


def summarize(path: str) -> Dict[str, Any]:
    """Structured summary of one checkpoint (either format)."""
    info: Dict[str, Any] = {
        "path": path,
        "format": "torch" if path.endswith(".pth") else "native",
        "epoch_from_name": _epoch_of(path.rsplit("/", 1)[-1]),
    }
    if info["format"] == "torch":
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(ckpt, dict) and "net" in ckpt:
            info["payload_keys"] = sorted(ckpt.keys())
            raw = {k: np.asarray(v) for k, v in ckpt["net"].items()}
        else:
            info["payload_keys"] = ["<bare state_dict>"]
            raw = {k: np.asarray(v) for k, v in ckpt.items()}
        info["dataparallel_prefix"] = any(k.startswith("module.") for k in raw)
        sd = remove_module_prefix(raw)
    else:
        state = load_checkpoint(path)
        info["payload_keys"] = sorted(state.keys())
        info["epoch_stored"] = state.get("epoch")
        info["dataparallel_prefix"] = False  # never written by this framework
        sd = _flatten(state["net"])
    info["n_tensors"] = len(sd)
    info["n_params"] = int(sum(v.size for v in sd.values()))
    info["selective"] = any(h in k for k in sd for h in _SELECTIVE_HEADS)
    info["tensors"] = {k: (tuple(v.shape), str(v.dtype)) for k, v in sorted(sd.items())}
    return info


def compare(path_a: str, path_b: str) -> Dict[str, Any]:
    """Canonical key/shape diff between two checkpoints of either format.

    This is the notebook's DP-vs-bare interchange check made exact: a torch
    DataParallel checkpoint and a native one of the same architecture must
    report empty ``only_in_a``/``only_in_b``/``shape_mismatch``.
    """
    a, b = canonical_state_dict(path_a), canonical_state_dict(path_b)
    shared = sorted(a.keys() & b.keys())
    return {
        "only_in_a": sorted(a.keys() - b.keys()),
        "only_in_b": sorted(b.keys() - a.keys()),
        "shape_mismatch": {
            k: (tuple(a[k].shape), tuple(b[k].shape))
            for k in shared
            if a[k].shape != b[k].shape
        },
        "n_shared": len(shared),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    p.add_argument("path", help=".ckpt (native) or .pth (reference) checkpoint")
    p.add_argument("--keys", action="store_true", help="print every tensor key/shape/dtype")
    p.add_argument("--compare", default=None, help="second checkpoint to key/shape-diff against")
    args = p.parse_args(argv)

    info = summarize(args.path)
    print(f"{info['path']}")
    print(f"  format: {info['format']}, payload keys: {info['payload_keys']}")
    epoch = info.get("epoch_stored", info["epoch_from_name"])
    print(f"  epoch: {epoch}")
    print(f"  tensors: {info['n_tensors']}, parameters: {info['n_params']:,}")
    print(f"  selective heads: {info['selective']}, "
          f"DataParallel 'module.' prefix: {info['dataparallel_prefix']}")
    if args.keys:
        for k, (shape, dtype) in info["tensors"].items():
            print(f"    {k}  {shape}  {dtype}")

    if args.compare:
        d = compare(args.path, args.compare)
        print(f"vs {args.compare}  (canonical reference naming)")
        print(f"  shared tensors: {d['n_shared']}")
        for label in ("only_in_a", "only_in_b"):
            if d[label]:
                print(f"  {label}: {d[label]}")
        if d["shape_mismatch"]:
            for k, (sa, sb) in d["shape_mismatch"].items():
                print(f"  shape mismatch {k}: {sa} vs {sb}")
        if not d["only_in_a"] and not d["only_in_b"] and not d["shape_mismatch"]:
            print("  MATCH: identical key sets and shapes")


if __name__ == "__main__":
    main()
