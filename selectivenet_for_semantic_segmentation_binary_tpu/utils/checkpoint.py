"""Epoch checkpointing with auto-resume and torch-.pth interchange.

Layout parity with the reference (train.py:385, net_utils.py:5-9, README):

    {model_dir}/{fold}-fold/checkpoint/model_epoch{N}.ckpt
    {model_dir}/{fold}-fold/log/{train,valid}

* one file per epoch, every epoch kept (no retention policy, matching the
  reference);
* resume picks the latest file by the digits in its name (net_utils.py:24) —
  "resume = rerun the same command" UX is preserved;
* like the reference, the optimizer state is saved but NOT restored by
  default (reference train.py:126 deliberately comments the restore out);
  pass restore_optim=True for the full restore net_train_load would do.

Format: flax msgpack of the numpy-fied state pytree — self-contained, no
orbax server processes, safe to read on any host.

Interchange: ``import_torch_checkpoint`` maps a reference ``model_epoch{N}.pth``
state-dict onto this framework's {params, batch_stats} pytree (OIHW->HWIO
kernels, spatially flipped transposed-conv kernels, BN running stats), and
tolerates the ``module.`` prefix torch DataParallel injects (net_utils.py:11-16),
so models trained with the reference evaluate here bit-for-bit.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization


# ---------------------------------------------------------------------------
# native save / load / resume
# ---------------------------------------------------------------------------

def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any], epoch: int) -> str:
    """Serialize {'net': ..., 'optim': ..., ...} to model_epoch{N}.ckpt
    (counterpart of net_save, net_utils.py:5-9)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"model_epoch{epoch}.ckpt")
    payload = serialization.msgpack_serialize(_to_numpy(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic: a crashing save never corrupts resume
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    """Retention policy (TPU-native extension; the reference keeps every
    epoch, net_save net_utils.py:5-9): delete all but the newest ``keep``
    native .ckpt files, ordered by the digits in their names. ``keep <= 0``
    keeps everything. Reference .pth files are never touched — they are
    imported artifacts, not this run's output."""
    if keep <= 0 or not os.path.isdir(ckpt_dir):
        return
    files = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")]
    files.sort(key=_epoch_of)
    for name in files[:-keep]:
        try:
            os.remove(os.path.join(ckpt_dir, name))
        except OSError:
            pass  # already gone / permission: retention is best-effort


class AsyncCheckpointWriter:
    """One-slot background checkpoint writer (``--ckpt_async 1``).

    Overlaps msgpack serialization + disk IO with the next epoch's compute —
    the async-save benefit an orbax CheckpointManager would bring, without
    changing the reference-parity on-disk layout (orbax writes per-step
    directories, not ``model_epoch{N}`` files; the layout is parity surface,
    reference net_utils.py:5-9). The caller must pass a HOST pytree
    (``jax.device_get`` first): train steps donate the device state, so a
    background thread must never hold device references.

    ``save`` joins the previous write first, so at most one write is ever
    outstanding and files land in epoch order (digit-sorted resume only
    needs ordering). ``wait`` must be called before the process exits and
    before any read-back (tests, eval-after-train).
    """

    def __init__(self) -> None:
        self._thread = None
        self._error: Optional[BaseException] = None

    def save(self, ckpt_dir: str, state: Dict[str, Any], epoch: int,
             keep: int = 0) -> None:
        import threading

        self.wait()

        def _write():
            try:
                save_checkpoint(ckpt_dir, state, epoch)
                prune_checkpoints(ckpt_dir, keep)
            except BaseException as e:  # surfaced on the next save()/wait()
                self._error = e

        self._thread = threading.Thread(
            target=_write, name=f"ckpt-epoch{epoch}", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


def resolve_checkpoint(model_path, model_dir):
    """One checkpoint path from the --model_path/--model_dir CLI pair.

    Exactly one of the two must be given; --model_dir resolves to the
    digit-latest ``model_epoch{N}`` file (the reference resume convention,
    net_utils.py:18-24). Used by the serving CLIs (snet-predict, snet-wsi).
    verify=False keeps startup to one deserialization on 1-core hosts — a
    corrupt file then fails loudly at load time instead of silently falling
    back to an older epoch (which is the right serving behavior).

    Raises ValueError with a CLI-ready message on misuse.
    """
    if (model_path is None) == (model_dir is None):
        raise ValueError("exactly one of --model_path / --model_dir is required")
    if model_path is not None:
        return model_path
    latest = latest_checkpoint(model_dir, verify=False)
    if latest is None:
        raise ValueError(f"no checkpoints in {model_dir}")
    return latest[0]


def _epoch_of(filename: str) -> int:
    digits = "".join(re.findall(r"\d+", filename))
    return int(digits) if digits else -1


def latest_checkpoint(ckpt_dir: str, verify: bool = True) -> Optional[Tuple[str, int]]:
    """Newest *loadable* checkpoint by digit-sorted filename (net_utils.py:18-24).

    Accepts both native .ckpt files and reference .pth files so a model
    directory produced by the reference resumes/evaluates directly.

    Resilience (no reference equivalent): if the newest file is corrupt —
    e.g. a run killed mid-write before the atomic rename existed, or disk
    truncation — fall back to the next older checkpoint instead of refusing
    to resume, so "rerun the same command" always recovers.

    ``verify=False`` skips the loadability probe (a FULL deserialization of
    a possibly multi-hundred-MB file) and just picks the digit-latest name —
    for callers that only need the epoch number (e.g. the sweep's
    remaining-epochs check); a corrupt file then surfaces loudly at load
    time instead of being silently skipped. Callers that will load the
    winner immediately should use ``load_latest_checkpoint`` (one parse)
    rather than verify + reload (two)."""
    if not os.path.isdir(ckpt_dir):
        return None
    files = [f for f in os.listdir(ckpt_dir) if f.endswith((".ckpt", ".pth"))]
    files.sort(key=_epoch_of)
    for name in reversed(files):
        path = os.path.join(ckpt_dir, name)
        if not verify or _loadable(path):
            return path, _epoch_of(name)
        print(f"skipping unreadable checkpoint {path}")
    return None


def load_latest_checkpoint(ckpt_dir: str):
    """Newest loadable checkpoint, parsed ONCE.

    Returns ``(path, epoch, payload)`` — ``payload`` is the parsed .ckpt
    dict; a reference .pth is imported in place (payload ``{"net": {params,
    batch_stats}}``), so every file is parsed exactly once — or None when
    nothing loadable exists. Same corrupt-newest fallback as
    latest_checkpoint. A missing torch install while a .pth is the newest
    file raises ImportError instead of silently treating the reference
    checkpoint as corrupt (which would restart training from epoch 0)."""
    if not os.path.isdir(ckpt_dir):
        return None
    files = [f for f in os.listdir(ckpt_dir) if f.endswith((".ckpt", ".pth"))]
    files.sort(key=_epoch_of)
    for name in reversed(files):
        path = os.path.join(ckpt_dir, name)
        try:
            if path.endswith(".pth"):
                return path, _epoch_of(name), {"net": import_torch_checkpoint(path)}
            return path, _epoch_of(name), load_checkpoint(path)
        except ImportError as e:
            raise ImportError(
                f"resuming from the reference checkpoint {path} requires "
                f"torch (pip install torch): {e}") from e
        except Exception:
            pass
        print(f"skipping unreadable checkpoint {path}")
    return None


def _loadable(path: str) -> bool:
    try:
        if path.endswith(".pth"):
            import torch

            torch.load(path, map_location="cpu", weights_only=False)
        else:
            load_checkpoint(path)
        return True
    except ImportError as e:
        # a missing torch install is an environment problem, not file
        # corruption — do not silently fall back past a reference .pth
        raise ImportError(
            f"verifying the reference checkpoint {path} requires torch "
            f"(pip install torch): {e}") from e
    except Exception:
        return False


def list_checkpoints(ckpt_dir: str):
    """All checkpoint files sorted by name (eval.py:116 discovers every .pth)."""
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(
        os.path.join(ckpt_dir, f)
        for f in os.listdir(ckpt_dir)
        if f.endswith((".ckpt", ".pth"))
    )


# ---------------------------------------------------------------------------
# torch .pth interchange
# ---------------------------------------------------------------------------

# torch module name -> flax scope path inside the model (models/unet.py)
_TRUNK_MAP = {
    "encoder_layer_1_1": ("trunk", "enc1_1"),
    "encoder_layer_1_2": ("trunk", "enc1_2"),
    "encoder_layer_2_1": ("trunk", "enc2_1"),
    "encoder_layer_2_2": ("trunk", "enc2_2"),
    "encoder_layer_3_1": ("trunk", "enc3_1"),
    "encoder_layer_3_2": ("trunk", "enc3_2"),
    "decoder_layer_4_2": ("trunk", "dec4_2"),
    "decoder_layer_4_1": ("trunk", "dec4_1"),
    "decoder_layer_3_2": ("trunk", "dec3_2"),
    "decoder_layer_3_1": ("trunk", "dec3_1"),
    "decoder_layer_2_2": ("trunk", "dec2_2"),
    "decoder_layer_2_1": ("trunk", "dec2_1"),
    "decoder_layer_1_2": ("trunk", "dec1_2"),
    "decoder_layer_1_1": ("trunk", "dec1_1"),
}
_UPCONV_MAP = {
    "unpool3": ("trunk", "unpool3"),
    "unpool2": ("trunk", "unpool2"),
    "unpool1": ("trunk", "unpool1"),
}
_HEAD_MAP = {
    "conv1x1": ("conv1x1",),
    "conv_select": ("conv_select",),
    "conv_aux": ("conv_aux",),
}


def remove_module_prefix(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Strip torch DataParallel's 'module.' prefix (net_utils.py:11-16)."""
    return {k.replace("module.", ""): v for k, v in state_dict.items()}


def _set(tree: dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def torch_state_dict_to_variables(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference model state-dict (model.py layer names) onto
    {'params': ..., 'batch_stats': ...} numpy pytrees."""
    sd = {k: np.asarray(v) for k, v in remove_module_prefix(state_dict).items()}
    params: dict = {}
    stats: dict = {}

    for tname, path in _TRUNK_MAP.items():
        # CBR block: .0 = conv, .1 = batchnorm (model.py:9-15)
        w = sd[f"{tname}.0.weight"]  # OIHW
        _set(params, path + ("conv", "kernel"), w.transpose(2, 3, 1, 0))
        _set(params, path + ("conv", "bias"), sd[f"{tname}.0.bias"])
        _set(params, path + ("bn", "scale"), sd[f"{tname}.1.weight"])
        _set(params, path + ("bn", "bias"), sd[f"{tname}.1.bias"])
        _set(stats, path + ("bn", "mean"), sd[f"{tname}.1.running_mean"])
        _set(stats, path + ("bn", "var"), sd[f"{tname}.1.running_var"])

    for tname, path in _UPCONV_MAP.items():
        w = sd[f"{tname}.weight"]  # torch convT: (in, out, kh, kw)
        # flax ConvTranspose kernel (kh, kw, in, out) equals torch's with the
        # spatial taps flipped (verified in tests/test_model.py)
        _set(params, path + ("convt", "kernel"), w.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
        _set(params, path + ("convt", "bias"), sd[f"{tname}.bias"])

    for tname, path in _HEAD_MAP.items():
        if f"{tname}.weight" not in sd:
            continue  # non-selective checkpoints have no select/aux heads
        w = sd[f"{tname}.weight"]
        _set(params, path + ("conv", "kernel"), w.transpose(2, 3, 1, 0))
        _set(params, path + ("conv", "bias"), sd[f"{tname}.bias"])

    return {"params": params, "batch_stats": stats}


def import_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth and return {'params', 'batch_stats'} pytrees."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    net = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    net = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in net.items()}
    return torch_state_dict_to_variables(net)


def _get(tree: dict, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def variables_to_torch_state_dict(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of torch_state_dict_to_variables: export {'params','batch_stats'}
    as a reference-named torch-layout state dict (numpy values), so models
    trained in this framework can be loaded by the reference's net_test_load
    (net_utils.py:42-53) after torch.save({'net': ...})."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: Dict[str, Any] = {}

    for tname, path in _TRUNK_MAP.items():
        conv = _get(params, path + ("conv",))
        sd[f"{tname}.0.weight"] = np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{tname}.0.bias"] = np.asarray(conv["bias"])
        bn = _get(params, path + ("bn",))
        bs = _get(stats, path + ("bn",))
        sd[f"{tname}.1.weight"] = np.asarray(bn["scale"])
        sd[f"{tname}.1.bias"] = np.asarray(bn["bias"])
        sd[f"{tname}.1.running_mean"] = np.asarray(bs["mean"])
        sd[f"{tname}.1.running_var"] = np.asarray(bs["var"])

    for tname, path in _UPCONV_MAP.items():
        convt = _get(params, path + ("convt",))
        k = np.asarray(convt["kernel"])[::-1, ::-1]  # undo the spatial flip
        sd[f"{tname}.weight"] = k.transpose(2, 3, 0, 1)
        sd[f"{tname}.bias"] = np.asarray(convt["bias"])

    for tname, path in _HEAD_MAP.items():
        try:
            conv = _get(params, path + ("conv",))
        except KeyError:
            continue
        sd[f"{tname}.weight"] = np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{tname}.bias"] = np.asarray(conv["bias"])
    return sd


def export_torch_checkpoint(variables: Dict[str, Any], path: str) -> str:
    """Write a reference-compatible .pth: torch.save({'net': state_dict})."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in variables_to_torch_state_dict(variables).items()
    }
    torch.save({"net": sd}, path)
    return path


def load_net_checkpoint(path: str) -> Dict[str, Any]:
    """Dispatch on extension: native .ckpt or reference .pth -> variables dict
    {'params', 'batch_stats'}."""
    if path.endswith(".pth"):
        return import_torch_checkpoint(path)
    state = load_checkpoint(path)
    return state["net"]
