"""Shared configuration for the train and eval entry points.

The reference keeps two independent argparse blocks (reference train.py:12-55 and
eval.py:16-57) with drifting flag names and ``type=bool`` truthy-string footguns.
Here both CLIs are generated from one pair of dataclasses so the public flag
surface is preserved (``--fold``, ``--model_arch``, ``--selective``, ``--s_lamb``,
``--select_eval``, ...) while the parsing bugs are repaired:

* boolean flags accept ``1/0/true/false/yes/no`` (the reference's ``--selective 1``
  keeps working, but ``--selective 0`` now actually means False);
* ``eval`` accepts both ``--test_fold`` (reference eval.py:22) and ``--fold``
  (what the reference README documents);
* ``--local_rank`` is kept for CLI compatibility but only its *length* matters:
  it selects how many devices of the mesh to use (the torch device-id semantics
  of reference train.py:104-134 do not apply to a TPU mesh).
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import List, Optional


def validate_output_dim(cfg) -> None:
    """Reject non-default ``--output_dim`` loudly (docs/PARITY.md).

    The reference's flag selected its host torch->numpy conversion convention
    (reference train.py:141-144, eval.py:166-168: NCHW transpose+squeeze vs
    NHW passthrough). Outputs here are natively (N, H, W) / (N, H, W, C) and
    metrics are layout-independent, so there is nothing for 'NCHW' to select —
    and a flag that silently does nothing corrupts experiment conclusions, so
    it is an error rather than a no-op. Called by both drivers (train_lib.train,
    eval_lib.evaluate) so library users constructing configs directly get the
    same guard as the CLIs."""
    val = getattr(cfg, "output_dim", "NHW")
    if val not in ("NHW", None):
        raise ValueError(
            f"--output_dim {val!r} is not supported: outputs are NHWC-native "
            "and the reference's NCHW/NHW switch only chose its host numpy "
            "conversion (reference train.py:141-144). Remove the flag (or "
            "pass NHW); CE-head class maps are returned (N, H, W, C) "
            "regardless (docs/PARITY.md).")


def parse_bool(v) -> bool:
    """Lenient bool parser replacing the reference's ``type=bool`` footgun."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("1", "true", "t", "yes", "y", "on"):
        return True
    if s in ("0", "false", "f", "no", "n", "off", ""):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


@dataclass
class TrainConfig:
    """Training configuration (flag surface of reference train.py:12-55)."""

    data_dir: str = "/data"
    fold: int = 1
    input_type: str = "RGB"          # 'RGB' | 'GH' | 'H_RGB'
    patch_mag: int = 200
    patch_size: int = 256
    n_cls: int = 2

    model_dir: str = "/model"
    model_arch: str = "UNet"         # 'UNet' (CE heads) | 'UNet_B' (binary heads)
    selective: bool = False
    s_lamb: float = 2.0              # lambda of the coverage constraint
    target_coverage: float = 0.8     # selective_loss.py:24 default
    output_dim: str = "NHW"          # reference output convention; only the
                                     # default 'NHW' is accepted — 'NCHW' is
                                     # rejected loudly (validate_output_dim)
    output_scale: str = "sigmoid"    # 'None' | 'clip' | 'sigmoid' | 'minmax'

    optim: str = "Adam"              # 'Adam' | 'SGD'
    momentum: float = 0.0
    w_decay: float = 0.0
    lr: float = 1e-3
    lr_sche: Optional[str] = None    # None | 'StepLR' | 'ReduceLR' | 'CosineAnnealingLR'
    patience: int = 10
    factor: float = 0.5
    lr_min: float = 1e-5

    loss: str = "CE"                 # 'BCElogit' | 'CE'

    batch_size: int = 16
    n_epoch: int = 100

    local_rank: List[int] = field(default_factory=lambda: [0])
    log_img: bool = False

    # --- TPU-native extensions (no reference equivalent) ---
    num_workers: int = 16            # decode threads (reference train.py:380)
    compute_dtype: str = "bfloat16"  # activations/conv compute dtype on TPU
    bn_stats: str = "float32"        # BN batch-statistics reduction dtype
                                     # ('bfloat16' = LowPrecStatsBN fast path)
    bn_mode: str = "global"          # 'global' (default, mesh-size-independent
                                     # global-batch BN) | 'per_replica'
                                     # (faithful torch-DataParallel emulation:
                                     # per-sub-batch stats, group-0 running
                                     # update; models/unet.py GroupedBatchNorm)
    bn_replicas: int = 0             # emulated replica count for per_replica
                                     # (0 = one group per mesh device; e.g. 8
                                     # reproduces the reference's train.sh
                                     # 8-GPU BN batch of batch_size/8)
    seed: int = 42
    drop_last: bool = True           # static shapes for jit; see data/loader.py
    restore_optim: bool = False      # reference deliberately skips it (train.py:126)
    dropout_rate: float = 0.0        # enables MC-uncertainty stochastic forwards
    profile_dir: Optional[str] = None  # jax.profiler trace of the 2nd epoch
    pnt_aug: bool = False            # PartialNonTissue augmentation (data_utils.py:127)
    blankfield: bool = False         # blank-field white-balance preprocessing ("BC")
    device_preproc: bool = True      # ship raw uint8, normalize/flip on device
    fused_cbr: str = "auto"          # fused-CBR Pallas trunk: auto | on | off
                                     # (auto = off: see train_lib.resolve_fused)
    ckpt_async: bool = False         # overlap checkpoint serialize+write with
                                     # the next epoch (one-slot background thread)
    keep_ckpt: int = 0               # retain only the newest N .ckpt files
                                     # (0 = keep every epoch, reference behavior)
    sp_ways: int = 1                 # spatial-parallel training: shard image
                                     # rows sp_ways across the mesh (DP x SP);
                                     # GSPMD inserts the conv halo exchanges
    train_quant: str = "none"        # 'int8': QAT — int8 W8A8 forward convs
                                     # in the train step (dynamic absmax
                                     # scales), bf16 straight-through
                                     # backward; valid/eval run the float
                                     # graph. Opt-in numerics deviation in
                                     # the --bn_stats mold (models/unet.py
                                     # int8_ste_conv); measured throughput/
                                     # convergence in docs/RESULTS.md
    remat: bool = False              # rematerialize the forward in backward
                                     # (jax.checkpoint over the loss fn):
                                     # trades ~10% throughput at 256px for a
                                     # much smaller activation footprint —
                                     # the huge-patch enabler next to sp_ways

    @property
    def n_devices(self) -> int:
        return max(1, len(self.local_rank))

    @property
    def ckpt_dir(self) -> str:
        return f"{self.model_dir}/{self.fold}-fold/checkpoint"

    @property
    def log_dir(self) -> str:
        return f"{self.model_dir}/{self.fold}-fold/log"

    @property
    def input_channels(self) -> int:
        # reference model.py:24-27 ('RGB' in input_type -> 3, 'GH' -> 2)
        return 2 if self.input_type == "GH" else 3


@dataclass
class EvalConfig:
    """Evaluation configuration (flag surface of reference eval.py:16-57)."""

    data_dir: str = "./data"
    test_fold: int = 1
    input_type: str = "RGB"
    patch_mag: int = 200
    patch_size: int = 256
    n_cls: int = 2

    batch_size: int = 16
    num_workers: int = 16

    model_dir: str = "*/model"
    model_arch: List[str] = field(default_factory=lambda: ["UNet_B"])
    selective: bool = False
    select_eval: bool = False
    output_dim: str = "NHW"

    single_scale: str = "sigmoid"    # 'None' | 'clip' | 'sigmoid' | 'minmax'
    ens_scale: str = "None"

    cut_off: float = 0.5
    s_cut_off: float = 0.5

    local_rank: List[int] = field(default_factory=lambda: [0])
    info_print: bool = False
    # reference eval.py:57 defaults this to './output', but only to feed its
    # broken dead-code CSV helper; here ANY explicitly-set value writes the
    # metric CSV, so the unset state must be None — a "default-path" sentinel
    # would silently swallow a user explicitly asking for ./output
    save_dir: Optional[str] = None

    # --- TPU-native extensions ---
    compute_dtype: str = "bfloat16"
    seed: int = 42
    use_pallas: bool = True  # fused eval-metrics kernel (single-chip binary path)
    blankfield: bool = False  # blank-field white-balance preprocessing ("BC")
    device_preproc: bool = True  # ship raw uint8, normalize on device
    sp_ways: int = 1  # spatial-parallel eval: shard image rows sp_ways (DP x SP)
    # 'int8': W8A8 quantized serving forward (ops/quant.py; measured 1.27x
    # over bf16 on v5e). Activation scales calibrate on the test fold's first
    # --calib_patches patches; every ensemble member quantizes independently.
    quantize: str = "none"
    # int8 calibration-sample width. 8 suffices on the synthetic task (metric
    # delta <= 3e-4 vs bf16 and insensitive 8 -> 64, docs/RESULTS.md); widen
    # for stain-diverse real WSI cohorts — scales only ever widen with more
    # samples (absmax), so a larger sample is never less safe, just slower.
    calib_patches: int = 8

    @property
    def n_devices(self) -> int:
        return max(1, len(self.local_rank))

    @property
    def input_channels(self) -> int:
        return 2 if self.input_type == "GH" else 3


def _add_args_from_dataclass(parser: argparse.ArgumentParser, cfg) -> None:
    for f in dataclasses.fields(type(cfg)):
        default = getattr(cfg, f.name)
        name = f"--{f.name}"
        if f.type in ("bool", bool) or isinstance(default, bool):
            parser.add_argument(name, type=parse_bool, default=default)
        elif isinstance(default, list):
            elem = type(default[0]) if default else str
            parser.add_argument(name, type=elem, nargs="+", default=default)
        elif default is None:
            parser.add_argument(name, type=str, default=None)
        else:
            parser.add_argument(name, type=type(default), default=default)


def parse_train_args(argv=None) -> TrainConfig:
    parser = argparse.ArgumentParser(description="SelectiveNet U-Net TPU training")
    _add_args_from_dataclass(parser, TrainConfig())
    ns = parser.parse_args(argv)
    cfg = TrainConfig(**vars(ns))
    if cfg.lr_sche in ("None", "none", ""):
        cfg.lr_sche = None
    try:
        validate_output_dim(cfg)  # fail at parse time, before any device work
    except ValueError as e:
        parser.error(str(e))
    return cfg


def parse_eval_args(argv=None) -> EvalConfig:
    parser = argparse.ArgumentParser(description="SelectiveNet U-Net TPU evaluation")
    _add_args_from_dataclass(parser, EvalConfig())
    # the reference README documents --fold while eval.py:22 implements --test_fold;
    # accept both (--fold wins if both are given explicitly).
    parser.add_argument("--fold", type=int, default=None)
    ns = parser.parse_args(argv)
    d = vars(ns)
    fold = d.pop("fold")
    cfg = EvalConfig(**d)
    if fold is not None:
        cfg.test_fold = fold
    try:
        validate_output_dim(cfg)
    except ValueError as e:
        parser.error(str(e))
    return cfg
