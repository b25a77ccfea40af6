"""Training driver: jitted data-parallel train/eval steps + the epoch loop.

TPU-first re-design of reference train.py:57-357:

* ONE jitted ``train_step`` holds the entire per-batch computation — forward,
  composite selective loss, backward, optimizer update, prediction
  thresholding, confusion-matrix counting and rejection tallies. The reference
  instead syncs output/input/label to host numpy every batch for thresholding
  and metrics (train.py:211-239); here only a handful of scalars and one (C,C)
  count matrix leave the device per step, asynchronously (SURVEY.md §7 risk 6).
* Parallelism: params replicated / batch sharded over a 1-D mesh (see
  parallel/mesh.py). Because the loss is computed on the *global* logical
  array, the selective coverage mean and BN batch statistics are global-batch
  quantities and the objective matches the reference's gathered-batch
  DataParallel semantics on any mesh size.
* The learning rate enters as a traced scalar, so host-side schedulers (incl.
  ReduceLROnPlateau) never recompile.
* Epoch flow, logging surface (TB scalars lr/loss/accuracy[/aux loss/
  selection loss/rejection ratio], first-5 image panels), stdout lines,
  per-epoch checkpointing with digit-sorted auto-resume all mirror the
  reference (train.py:158-357).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .config import TrainConfig
from .data import (
    Compose,
    Normalization,
    PatchDataset,
    PatchLoader,
    RandomFlip,
    ToArray,
    construct_train_valid,
)
from .models import build_model
from .ops import (
    bce_with_logits,
    selective_risk_b,
    selective_risk_ce,
    softmax_cross_entropy,
)
from .ops.confusion import PAD_LABEL, confusion_matrix_update
from .optim import build_optimizer, build_scheduler
from .parallel.mesh import (batch_sharding, make_mesh, make_mesh_dp_sp,
                            replicate)
from .utils.checkpoint import (
    AsyncCheckpointWriter,
    load_latest_checkpoint,
    prune_checkpoints,
    save_checkpoint,
)
from .utils.metrics import Evaluator
from .utils.tb_writer import SummaryWriter


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any


class _NullWriter:
    """Drop-in SummaryWriter stand-in for non-zero fleet processes."""

    def add_scalar(self, *a, **k) -> None: ...

    def add_images(self, *a, **k) -> None: ...

    def close(self) -> None: ...


# ---------------------------------------------------------------------------
# step construction
# ---------------------------------------------------------------------------

def device_preprocess(batch):
    """Normalize + augment ON DEVICE when the loader ships raw uint8 batches.

    The host pipeline's in-Python transforms are GIL-bound (16 threads measured
    ~325 patches/s) and float32 batches cost 4x the transfer of uint8; with
    device_preproc the host only decodes, and this function — traced into the
    jitted step — does /255, (x-0.5)/0.5 and the per-sample flips the loader
    chose (bit-identical math to data/transforms.py Normalization+RandomFlip).
    float batches pass through untouched, so both pipelines share the steps.
    """
    x = batch["input"]
    label = batch["label"].astype(jnp.int32)
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * (1.0 / 255.0)
        x = (x - 0.5) / 0.5
    if "flips" in batch:
        fl = batch["flips"].astype(bool)
        lr = fl[:, 0][:, None, None]
        ud = fl[:, 1][:, None, None]
        # reference RandomFlip: fliplr = width axis, flipud = height axis
        x = jnp.where(lr[..., None], jnp.flip(x, axis=2), x)
        x = jnp.where(ud[..., None], jnp.flip(x, axis=1), x)
        label = jnp.where(lr, jnp.flip(label, axis=2), label)
        label = jnp.where(ud, jnp.flip(label, axis=1), label)
    return x, label


def _predictions(cfg, output, selection):
    """Threshold logits into class maps, on device (reference train.py:216-236).

    BCE path ('NHW' outputs): optional sigmoid rescale then > 0.5.
    CE path (NHWC outputs): argmax over the class axis.
    """
    if output.ndim == 3:  # binary logits
        prob = jax.nn.sigmoid(output) if cfg.output_scale == "sigmoid" else output
        pred = (prob > 0.5).astype(jnp.int32)
    else:
        pred = jnp.argmax(output, axis=-1).astype(jnp.int32)

    sel_mask = None
    if selection is not None:
        if selection.ndim == 3:
            s = jax.nn.sigmoid(selection) if cfg.output_scale == "sigmoid" else selection
            sel_mask = (s > 0.5).astype(jnp.int32)
        else:
            sel_mask = jnp.argmax(selection, axis=-1).astype(jnp.int32)
    return pred, sel_mask


def _losses(cfg, outputs, label, mask=None):
    """Composite objective (reference train.py:193-204).

    ``mask`` marks valid (non-padded) pixels; it is None on the training path
    (drop_last=True -> no padding) and set on the validation path so padded
    pixels of the static-shape final batch cannot contaminate the loss.
    """
    use_bce = "BCE" in cfg.loss
    if cfg.selective:
        output, selection, aux = outputs
        if use_bce:
            aux_loss = bce_with_logits(aux, label, mask=mask)
            sel_loss, coverage = selective_risk_b(
                output, selection, label,
                target_coverage=cfg.target_coverage, lamb=cfg.s_lamb, mask=mask,
            )
        else:
            aux_loss = softmax_cross_entropy(aux, label, mask=mask)
            sel_loss, coverage = selective_risk_ce(
                output, selection, label,
                target_coverage=cfg.target_coverage, lamb=cfg.s_lamb, mask=mask,
            )
        return aux_loss + sel_loss, {
            "aux_loss": aux_loss, "sel_loss": sel_loss, "coverage": coverage,
        }, output, selection
    output = outputs
    if use_bce:
        loss = bce_with_logits(output, label, mask=mask)
    else:
        loss = softmax_cross_entropy(output, label, mask=mask)
    return loss, {}, output, None


def _batch_metrics(cfg, label_int, pred, sel_mask):
    """On-device confusion matrix + rejection tallies."""
    cm = confusion_matrix_update(label_int, pred, cfg.n_cls, sel_mask)
    valid = ((label_int >= 0) & (label_int < cfg.n_cls)).astype(jnp.int32)
    n_valid = jnp.sum(valid)
    metrics = {"cm": cm, "n_pix": n_valid}
    if sel_mask is not None:
        metrics["n_reject"] = n_valid - jnp.sum(sel_mask * valid)
    return metrics


def resolve_fused(cfg, mesh) -> bool:
    """Whether to build the fused-CBR Pallas trunk (ops/fused_cbr.py).

    'auto' currently resolves to OFF: although each fused conv beats the
    ISOLATED XLA conv+BN+ReLU chain by 1.08-1.29x, the end-to-end step
    measured 394 vs 473 patches/s — in-net XLA assigns batch-minor layouts
    to activations ({3,0,2,1}; at C=64 it packs N with C to fill lanes),
    and every pallas/XLA-conv boundary inserts large transpose copies that
    eat the win (docs/RESULTS.md round-2 section). 'on' keeps the trunk
    available for experiments (single-chip only: a pallas_call inside the
    GSPMD-jitted step has no partitioning rule).

    'on' in an environment that cannot run the Pallas trunk RAISES instead of
    silently resolving off: an experiment flag that no-ops corrupts
    experiment conclusions (same guard as build_model's bn_stats check,
    models/unet.py:547-552)."""
    mode = getattr(cfg, "fused_cbr", "auto")
    if mode == "on":
        if jax.default_backend() != "tpu":
            raise ValueError(
                "--fused_cbr on requires a TPU backend (the Pallas fused-CBR "
                f"kernels have no {jax.default_backend()} path); use "
                "--fused_cbr auto/off here")
        if mesh.devices.size != 1:
            raise ValueError(
                "--fused_cbr on is single-chip only (a pallas_call inside "
                "the GSPMD-jitted step has no partitioning rule); got a "
                f"{mesh.devices.size}-device mesh — use --fused_cbr auto/off "
                "or --local_rank with one device")
        return True
    return False


def resolve_bn_groups(cfg, mesh) -> int:
    """Resolve ``--bn_mode per_replica``'s emulated replica count.

    ``--bn_replicas 0`` (default) means one BN group per mesh device — the
    literal DataParallel analog of the current run; an explicit N lets a
    single chip faithfully reproduce the reference's 8-GPU recipe (train.sh:1
    gives an effective BN batch of 128/8). The batch must split into equal
    groups, exactly like DataParallel's dim-0 scatter; a non-divisible
    combination is rejected here with the flag names, not later by a shape
    error inside the traced model."""
    if getattr(cfg, "bn_mode", "global") != "per_replica":
        return 1
    groups = int(getattr(cfg, "bn_replicas", 0)) or int(mesh.devices.size)
    if groups < 1:
        raise ValueError(f"--bn_replicas must be >= 0, got {groups}")
    if cfg.batch_size % groups:
        raise ValueError(
            f"--bn_mode per_replica needs --batch_size ({cfg.batch_size}) "
            f"divisible by the replica count ({groups}, from "
            f"--bn_replicas {getattr(cfg, 'bn_replicas', 0)} / mesh size "
            f"{mesh.devices.size}) — DataParallel scatters equal sub-batches "
            "(reference train.py:132-134)")
    return groups


class _StepKey(NamedTuple):
    """The TrainConfig fields the jitted train/valid steps close over —
    hashable so structurally identical runs (e.g. the sweep harness's one
    train() per grid cell) reuse one compiled step instead of paying a fresh
    trace+compile, which over the axon tunnel is 30 s-20 min (RESULTS.md)."""

    loss: str
    selective: bool
    s_lamb: float
    target_coverage: float
    n_cls: int
    drop_last: bool
    dropout_rate: float
    log_img: bool
    output_scale: str
    remat: bool


def _step_key(cfg: TrainConfig) -> _StepKey:
    return _StepKey(
        loss=cfg.loss, selective=bool(cfg.selective), s_lamb=float(cfg.s_lamb),
        target_coverage=float(cfg.target_coverage), n_cls=int(cfg.n_cls),
        drop_last=bool(cfg.drop_last), dropout_rate=float(cfg.dropout_rate),
        log_img=bool(cfg.log_img), output_scale=cfg.output_scale,
        remat=bool(getattr(cfg, "remat", False)),
    )


def make_train_step(model, cfg: TrainConfig, tx) -> Callable:
    """Build the jitted (state, batch, lr, rng) -> (state, metrics) step.
    Cached on (model, step-relevant cfg fields, tx) — see _StepKey."""
    return _build_train_step(model, _step_key(cfg), tx)


@lru_cache(maxsize=16)
def _build_train_step(model, cfg: _StepKey, tx) -> Callable:
    use_bce = "BCE" in cfg.loss

    def step(state: TrainState, batch, lr, rng):
        x, label_int = device_preprocess(batch)
        label = label_int.astype(jnp.float32) if use_bce else label_int
        # padding exists only when drop_last is off; the mask costs a few
        # extra reductions, so it is built only in that configuration
        mask = None
        if not cfg.drop_last:
            mask = (label_int >= 0) & (label_int < cfg.n_cls)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            rngs = {"dropout": rng} if cfg.dropout_rate > 0 else None
            outputs, mutated = model.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs
            )
            loss, extras, output, selection = _losses(cfg, outputs, label, mask=mask)
            return loss, (mutated["batch_stats"], extras, output, selection)

        if cfg.remat:
            # rematerialize: save only the step inputs, recompute the whole
            # forward inside the backward pass. Costs ~10% throughput at
            # batch-128/256px (measured, docs/RESULTS.md round-3 lever sweep)
            # but collapses the live activation footprint — the HBM enabler
            # for huge patches, alone or together with --sp_ways.
            loss_fn_for_grad = jax.checkpoint(loss_fn)
        else:
            loss_fn_for_grad = loss_fn
        (loss, (new_stats, extras, output, selection)), grads = jax.value_and_grad(
            loss_fn_for_grad, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)

        pred, sel_mask = _predictions(cfg, output, selection)
        metrics = {"loss": loss, **extras, **_batch_metrics(cfg, label_int, pred, sel_mask)}
        if cfg.log_img:
            metrics["pred"] = pred
            if sel_mask is not None:
                metrics["selection"] = sel_mask

        new_state = TrainState(
            params=new_params, batch_stats=new_stats, opt_state=new_opt_state
        )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_valid_step(model, cfg: TrainConfig) -> Callable:
    """Validation step: eval-mode forward (running BN stats) + loss + metrics
    (reference train.py:275-331). Cached like make_train_step."""
    return _build_valid_step(model, _step_key(cfg))


@lru_cache(maxsize=16)
def _build_valid_step(model, cfg: _StepKey) -> Callable:
    use_bce = "BCE" in cfg.loss

    def step(state: TrainState, batch):
        x, label_int = device_preprocess(batch)
        label = label_int.astype(jnp.float32) if use_bce else label_int
        mask = (label_int >= 0) & (label_int < cfg.n_cls)  # padded pixels excluded
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        outputs = model.apply(variables, x, train=False)
        loss, extras, output, selection = _losses(cfg, outputs, label, mask=mask)
        pred, sel_mask = _predictions(cfg, output, selection)
        return {"loss": loss, **extras, **_batch_metrics(cfg, label_int, pred, sel_mask)}

    return jax.jit(step)


# ---------------------------------------------------------------------------
# state creation / restore
# ---------------------------------------------------------------------------

def create_state(cfg: TrainConfig, model, tx, rng) -> TrainState:
    sample = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.input_channels), jnp.float32)
    variables = model.init(rng, sample, train=False)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )


def restore_if_available(
    cfg: TrainConfig, state: TrainState
) -> Tuple[TrainState, int, Optional[dict]]:
    """Auto-resume from the digit-latest checkpoint (reference train.py:111-129).

    Like the reference, only the network (params + BN stats) is restored by
    default; optimizer restore is opt-in via cfg.restore_optim. Returns the
    saved scheduler state (if any) so loss-dependent schedules like ReduceLR
    resume with their lr/best/bad-epoch counters instead of restarting at lr0.
    """
    found = load_latest_checkpoint(cfg.ckpt_dir)
    if found is None:
        return state, 0, None
    path, epoch, ckpt = found
    # .pth payloads arrive pre-imported as {"net": {params, batch_stats}}
    # (load_latest_checkpoint parses every file exactly once)
    state = state.replace(
        params=ckpt["net"]["params"], batch_stats=ckpt["net"]["batch_stats"]
    )
    sched_state = ckpt.get("scheduler")
    if cfg.restore_optim and "optim" in ckpt:
        from flax import serialization

        state = state.replace(
            opt_state=serialization.from_state_dict(state.opt_state, ckpt["optim"])
        )
    print(f"Load weights from {path}")
    return state, epoch, sched_state


# ---------------------------------------------------------------------------
# epoch loop
# ---------------------------------------------------------------------------

@dataclass
class EpochStats:
    loss: float
    acc: float
    aux_loss: Optional[float] = None
    sel_loss: Optional[float] = None
    rejection: Optional[float] = None
    patches: int = 0
    seconds: float = 0.0

    @property
    def patches_per_sec(self) -> float:
        return self.patches / self.seconds if self.seconds > 0 else 0.0


def _run_epoch(cfg, loader, step_fn, state, lr, rng, train: bool):
    """One pass over a loader; returns (state, EpochStats, last_batch, last_metrics)."""
    evaluator = Evaluator(cfg.n_cls, selective=cfg.selective)
    device_metrics = []
    device_cms = []  # per-step int32 matrices; summed in float64 on host
    t0 = time.perf_counter()
    patches = 0
    last_batch = last_metrics = None

    for i, batch in enumerate(loader):
        device_batch = {"input": batch["input"], "label": batch["label"]}
        if "flips" in batch:
            device_batch["flips"] = batch["flips"]
        if train:
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, device_batch, lr, sub)
        else:
            metrics = step_fn(state, device_batch)
        device_cms.append(metrics.pop("cm"))
        pred_imgs = {k: metrics.pop(k) for k in ("pred", "selection") if k in metrics}
        device_metrics.append(metrics)
        patches += batch["nvalid"]
        last_batch, last_metrics = batch, {**metrics, **pred_imgs}

    # single host sync per epoch; cross-batch counts accumulate in float64 on
    # host (per-step int32 matrices would overflow over a long WSI epoch)
    if device_metrics:
        host = jax.device_get(device_metrics)
        for cm in jax.device_get(device_cms):
            evaluator.add_confusion_matrix(cm)
    else:
        host = []
    seconds = time.perf_counter() - t0

    losses = [float(m["loss"]) for m in host]
    stats = EpochStats(
        loss=float(np.mean(losses)) if losses else float("nan"),
        acc=evaluator.get_Pixel_Accuracy() if evaluator.confusion_matrix.sum() else float("nan"),
        patches=patches,
        seconds=seconds,
    )
    if cfg.selective:
        if host:
            stats.aux_loss = float(np.mean([float(m["aux_loss"]) for m in host]))
            stats.sel_loss = float(np.mean([float(m["sel_loss"]) for m in host]))
            total_pix = sum(int(m["n_pix"]) for m in host)
            total_rej = sum(int(m["n_reject"]) for m in host)
            stats.rejection = total_rej / total_pix if total_pix else float("nan")
        else:
            # zero-batch epoch (e.g. drop_last with len(dataset) < batch_size):
            # degrade to NaN like loss/acc so TB writes and the verbose
            # summary don't crash on None
            stats.aux_loss = stats.sel_loss = stats.rejection = float("nan")
    return state, stats, last_batch, last_metrics


def _log_epoch_images(writer, cfg, batch, metrics, epoch):
    """First-5 input/label/pred(/selection) panels (reference train.py:266-271)."""
    inp = np.asarray(jax.device_get(batch["input"]))[:5]
    if inp.dtype == np.uint8:  # raw device-preproc batch: already display-ready
        inp = inp.astype(np.float32) / 255.0
    else:
        inp = inp * 0.5 + 0.5  # denormalize (train.py:139)
    label = np.asarray(jax.device_get(batch["label"]))[:5]
    if "flips" in batch:
        # device_preproc mode: pred/selection come from the jitted step AFTER
        # the per-sample flips were applied on device — mirror the same flips
        # here so the logged input/label panels stay aligned with pred.
        inp, label = inp.copy(), label.copy()
        flips = np.asarray(jax.device_get(batch["flips"]))[:5].astype(bool)
        for i, (lr, ud) in enumerate(flips):
            if lr:  # width axis (device_preprocess axis=2)
                inp[i] = inp[i][:, ::-1]
                label[i] = label[i][:, ::-1]
            if ud:  # height axis (device_preprocess axis=1)
                inp[i] = inp[i][::-1]
                label[i] = label[i][::-1]
    writer.add_images("input", inp, epoch)
    # PAD_LABEL=255 rows of a padded partial batch would wrap under the
    # uint8 *255 scaling (255*255 -> 1); render padding as background
    label = np.where(label == PAD_LABEL, 0, label)
    # space CE-head class ids evenly over gray levels (binary keeps 0/255);
    # a flat *255 wraps in uint8 for class ids >= 2 (same fix as snet-predict)
    scale = np.uint8(255 // max(int(cfg.n_cls) - 1, 1))
    writer.add_images("label",
                      np.expand_dims(label.astype(np.uint8) * scale, -1), epoch)
    if "pred" in metrics:
        pred = np.asarray(jax.device_get(metrics["pred"]))[:5]
        writer.add_images("pred",
                          np.expand_dims(pred.astype(np.uint8) * scale, -1), epoch)
    if "selection" in metrics:
        sel = np.asarray(jax.device_get(metrics["selection"]))[:5]
        writer.add_images("selection",
                          np.expand_dims((sel * 255).astype(np.uint8), -1), epoch)


def make_loaders(cfg: TrainConfig, mesh) -> Tuple[PatchLoader, PatchLoader]:
    """Fold lists + datasets + sharded loaders (reference train.py:367-381).

    When the pipeline needs no host-side color math (plain RGB, no
    blankfield/PNT), raw uint8 batches + device-side normalize/flip are used
    (see device_preprocess) — the host then only decodes.
    """
    train_list, valid_list = construct_train_valid(cfg.data_dir, test_fold=cfg.fold,
                                                   seed=cfg.seed)
    raw_mode = (
        getattr(cfg, "device_preproc", True)
        and cfg.input_type == "RGB"
        and not getattr(cfg, "blankfield", False)
        and not getattr(cfg, "pnt_aug", False)
    )
    sharding = batch_sharding(mesh)
    # Multi-host: each process decodes only its contiguous slice of every
    # global batch; put_global assembles (parallel/multihost.py). (0, 1)
    # single-process is the identity configuration.
    proc = dict(process_index=jax.process_index(),
                process_count=jax.process_count())

    if raw_mode:
        ds_train = PatchDataset(cfg.data_dir, train_list, cfg.patch_mag,
                                cfg.patch_size, cfg.input_type)
        ds_valid = PatchDataset(cfg.data_dir, valid_list, cfg.patch_mag,
                                cfg.patch_size, cfg.input_type)
        loader_train = PatchLoader(ds_train, cfg.batch_size, shuffle=True,
                                   num_workers=cfg.num_workers, drop_last=cfg.drop_last,
                                   seed=cfg.seed, sharding=sharding,
                                   device_preproc=True, random_flip=True, **proc)
        loader_valid = PatchLoader(ds_valid, cfg.batch_size, shuffle=False,
                                   num_workers=cfg.num_workers, drop_last=False,
                                   seed=cfg.seed, sharding=sharding,
                                   device_preproc=True, random_flip=False, **proc)
        return loader_train, loader_valid

    pre = []
    if getattr(cfg, "blankfield", False):
        from .data.transforms import BlankfieldCorrection

        pre.append(BlankfieldCorrection())
    train_aug = []
    if getattr(cfg, "pnt_aug", False):
        from .data.transforms import PartialNonTissue

        train_aug.append(PartialNonTissue())
    tf_train = Compose(pre + train_aug + [Normalization(0.5, 0.5), RandomFlip(), ToArray()])
    tf_valid = Compose(pre + [Normalization(0.5, 0.5), ToArray()])
    ds_train = PatchDataset(cfg.data_dir, train_list, cfg.patch_mag, cfg.patch_size,
                            cfg.input_type, transform=tf_train)
    ds_valid = PatchDataset(cfg.data_dir, valid_list, cfg.patch_mag, cfg.patch_size,
                            cfg.input_type, transform=tf_valid)
    loader_train = PatchLoader(ds_train, cfg.batch_size, shuffle=True,
                               num_workers=cfg.num_workers, drop_last=cfg.drop_last,
                               seed=cfg.seed, sharding=sharding, **proc)
    loader_valid = PatchLoader(ds_valid, cfg.batch_size, shuffle=False,
                               num_workers=cfg.num_workers, drop_last=False,
                               seed=cfg.seed, sharding=sharding, **proc)
    return loader_train, loader_valid


def train(cfg: TrainConfig, loaders=None, verbose: bool = True) -> Dict[str, Any]:
    """Full training run (reference train.py:57-357). Returns final stats."""
    from .config import validate_output_dim

    validate_output_dim(cfg)
    mesh = make_mesh_dp_sp(cfg.n_devices, getattr(cfg, "sp_ways", 1),
                           cfg.batch_size, cfg.patch_size)

    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                        cfg.compute_dtype, cfg.dropout_rate,
                        fused=resolve_fused(cfg, mesh),
                        bn_stats=getattr(cfg, "bn_stats", "float32"),
                        bn_mode=getattr(cfg, "bn_mode", "global"),
                        bn_groups=resolve_bn_groups(cfg, mesh),
                        train_quant=getattr(cfg, "train_quant", "none"))
    if verbose and getattr(cfg, "train_quant", "none") != "none":
        print(f"train_quant={cfg.train_quant}: QAT int8 W8A8 forward convs, "
              "bf16 straight-through backward (documented numerics "
              "deviation; valid/eval run the float graph)")
    tx = build_optimizer(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = create_state(cfg, model, tx, init_rng)
    state, start_epoch, sched_state = restore_if_available(cfg, state)
    state = replicate(state, mesh)

    scheduler = build_scheduler(cfg)
    if sched_state is not None:
        scheduler.load_state_dict(sched_state)
    else:
        for _ in range(start_epoch):  # fast-forward epoch-indexed schedules
            if cfg.lr_sche in ("StepLR", "CosineAnnealingLR"):
                scheduler.step()

    train_step = make_train_step(model, cfg, tx)
    valid_step = make_valid_step(model, cfg)

    if loaders is None:
        loaders = make_loaders(cfg, mesh)
    loader_train, loader_valid = loaders

    # Multi-process fleet: host 0 owns every filesystem artifact (checkpoints,
    # TB events). All hosts still RESTORE (shared-fs layout), and the metric
    # values are replicated jit outputs so every host computes identical
    # numbers — only the writes are deduplicated (save_checkpoint's atomic
    # rename uses a fixed .tmp name, and same-host TB event files can collide,
    # so concurrent same-dir writers would corrupt each other).
    is_writer = jax.process_index() == 0
    if is_writer:
        writer_train = SummaryWriter(f"{cfg.log_dir}/train")
        writer_valid = SummaryWriter(f"{cfg.log_dir}/valid")
    else:
        writer_train = writer_valid = _NullWriter()

    ckpt_writer = (AsyncCheckpointWriter()
                   if is_writer and getattr(cfg, "ckpt_async", False) else None)

    final: Dict[str, Any] = {}
    try:
        for epoch in range(start_epoch + 1, start_epoch + cfg.n_epoch + 1):
            current_lr = scheduler.lr
            writer_train.add_scalar("lr", current_lr, epoch)
            if verbose:
                print(f"epoch {epoch} / {start_epoch + cfg.n_epoch}, learning rate {current_lr}")

            if hasattr(loader_train, "set_epoch"):
                loader_train.set_epoch(epoch)
            rng, epoch_rng = jax.random.split(rng)
            # profile the 2nd epoch of the run (past compilation) when requested
            profiling = cfg.profile_dir is not None and epoch == start_epoch + 2
            if profiling:
                jax.profiler.start_trace(cfg.profile_dir)
            try:
                state, tr, tr_batch, tr_metrics = _run_epoch(
                    cfg, loader_train, train_step, state, current_lr, epoch_rng, train=True
                )
            finally:
                # flush the trace even when the profiled epoch dies — the
                # partial profile is the most useful debugging artifact, and
                # a dangling start_trace poisons any later trace attempt
                if profiling:
                    jax.profiler.stop_trace()

            if cfg.lr_sche is not None:
                scheduler.step(tr.loss if cfg.lr_sche == "ReduceLR" else None)

            writer_train.add_scalar("loss", tr.loss, epoch)
            writer_train.add_scalar("accuracy", tr.acc, epoch)
            writer_train.add_scalar("patches_per_sec", tr.patches_per_sec, epoch)
            if cfg.selective:
                writer_train.add_scalar("aux loss", tr.aux_loss, epoch)
                writer_train.add_scalar("selection loss", tr.sel_loss, epoch)
                writer_train.add_scalar("rejection ratio", tr.rejection, epoch)
            # image panels need the full global batch on one host; a fleet's
            # batch shards are not fully addressable, so panels are single-
            # process only (scalar logging is unaffected)
            if cfg.log_img and tr_batch is not None and jax.process_count() == 1:
                _log_epoch_images(writer_train, cfg, tr_batch, tr_metrics, epoch)

            _, va, _, _ = _run_epoch(
                cfg, loader_valid, valid_step, state, current_lr, rng, train=False
            )
            writer_valid.add_scalar("loss", va.loss, epoch)
            writer_valid.add_scalar("accuracy", va.acc, epoch)
            if cfg.selective:
                writer_valid.add_scalar("aux loss", va.aux_loss, epoch)
                writer_valid.add_scalar("selection loss", va.sel_loss, epoch)
                writer_valid.add_scalar("rejection ratio", va.rejection, epoch)

            if verbose:
                print(
                    "train_loss %.05f train_acc %.04f | valid_loss %.05f valid_acc %.04f"
                    " | %.0f patches/s"
                    % (tr.loss, tr.acc, va.loss, va.acc, tr.patches_per_sec)
                )
                if cfg.selective:
                    print(
                        "train_aux_loss %.05f | train_select_loss %.05f | train_rejection %.03f"
                        % (tr.aux_loss, tr.sel_loss, tr.rejection)
                    )
                    print(
                        "valid_aux_loss %.05f | valid_select_loss %.05f | valid_rejection %.03f"
                        % (va.aux_loss, va.sel_loss, va.rejection)
                    )

            ckpt_error: Optional[BaseException] = None
            if is_writer:
                try:
                    host_state = jax.device_get(state)
                    payload = {
                        "net": {"params": host_state.params, "batch_stats": host_state.batch_stats},
                        "optim": _opt_state_dict(host_state.opt_state),
                        "scheduler": scheduler.state_dict(),
                        "epoch": epoch,
                    }
                    keep = cfg.keep_ckpt
                    if ckpt_writer is not None:
                        ckpt_writer.save(cfg.ckpt_dir, payload, epoch, keep=keep)
                    else:
                        save_checkpoint(cfg.ckpt_dir, payload, epoch)
                        prune_checkpoints(cfg.ckpt_dir, keep)
                except Exception as e:  # noqa: BLE001 — relayed fleet-wide below
                    ckpt_error = e
            _fleet_checkpoint_agreement(ckpt_error)
            final = {"epoch": epoch, "train": tr, "valid": va, "state": state}

        # join the FINAL epoch's in-flight async write inside the agreement
        # protocol too, so a write error on host 0 aborts every process
        # instead of stranding the others at the end-of-train barrier
        join_error: Optional[BaseException] = None
        if ckpt_writer is not None:
            try:
                ckpt_writer.wait()
            except Exception as e:  # noqa: BLE001
                join_error = e
        _fleet_checkpoint_agreement(join_error)

    finally:
        # flush TB event files and join the in-flight async write even on
        # error/interrupt, so an issued epoch-N save always lands and stored
        # write errors surface
        try:
            writer_train.close()
            writer_valid.close()
        finally:
            if ckpt_writer is not None:
                ckpt_writer.wait()

    if jax.process_count() > 1:
        # fleet barrier: returning means "checkpoints durable" on every host,
        # so a follow-on evaluate() cannot race host 0's final epoch write
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("snet_train_done")
    return final


def _fleet_checkpoint_agreement(error: Optional[BaseException]) -> None:
    """Fleet-wide agreement that the writer host's checkpoint landed.

    Checkpoints are written by host 0 only; without this, a write failure
    there (disk full, unwritable mount) kills host 0 with an exception while
    hosts 1..N — which saw no error — block forever in the next epoch's
    collectives. Every process contributes an ok flag (one tiny allgather per
    epoch, multi-process only); any failure raises on ALL hosts, so the fleet
    dies loudly together exactly like the old every-host-writes behavior."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        ok = multihost_utils.process_allgather(
            np.asarray(error is None, np.int32))
        if int(np.min(ok)) == 0:
            if error is not None:
                raise error
            raise RuntimeError(
                "checkpoint write failed on the writer host; aborting fleet")
    elif error is not None:
        raise error


def _opt_state_dict(opt_state):
    from flax import serialization

    return serialization.to_state_dict(opt_state)
