"""Experiment-grid sweep harness: fold x variant train/eval with best-epoch
selection and CSV summary.

Replaces reference u-net_testing.ipynb cells 21-60, which repeat the WSI
scoring flow across 5-fold CV for six experiment variants (baseline / added
non-tissue / PartialNonTissue aug / Blankfield correction / GH with and
without BC) with HAND-PICKED per-fold best-epoch lists and per-variant CSV
summaries. This harness automates the same report shape:

1. for every (variant, fold): train (auto-resuming) under
   ``{model_root}/{variant}/{fold}-fold/...`` — the reference checkpoint
   layout per fold;
2. best-epoch selection: every epoch checkpoint is scored on the fold's
   VALIDATION split (the reference picked epochs from the valid TB curves by
   hand); the best checkpoint by ``select_metric`` wins;
3. the winner is scored on the fold's TEST split — the same metric block
   eval.py:261-280 prints;
4. one CSV: a per-(variant, fold) row plus a nanmean summary row per variant
   (the notebook's nanmean aggregation, cells 7-8).

The reference's NT-add variant is a DATASET change (extra mined non-tissue
patches, check_rgb_color_space.ipynb cell 10), not a flag: reproduce it by
passing a variant whose ``data_dir`` points at a tree augmented with
``tools.mine_non_tissue`` output.
"""

from __future__ import annotations

import glob
import os
import tempfile
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import EvalConfig, TrainConfig, parse_bool
from ..data import construct_train_valid
from ..eval_lib import evaluate, make_eval_loader
from ..parallel.mesh import make_mesh
from ..train_lib import train
from ..utils.checkpoint import _epoch_of, latest_checkpoint, list_checkpoints
from .wsi import save_performance_as_csv


@dataclass(frozen=True)
class Variant:
    """One experiment-grid cell: a name plus TrainConfig/EvalConfig deltas."""

    name: str
    train_kw: dict = field(default_factory=dict)
    eval_kw: dict = field(default_factory=dict)
    data_dir: Optional[str] = None  # NT-add style variants swap the dataset


def default_grid() -> Tuple[Variant, ...]:
    """The reference's experiment grid (u-net_testing.ipynb cells 21-60)."""
    return (
        Variant("baseline"),
        Variant("PNT", train_kw={"pnt_aug": True}),
        Variant("BC", train_kw={"blankfield": True}, eval_kw={"blankfield": True}),
        Variant("GH", train_kw={"input_type": "GH"}, eval_kw={"input_type": "GH"}),
        Variant("GH_BC",
                train_kw={"input_type": "GH", "blankfield": True},
                eval_kw={"input_type": "GH", "blankfield": True}),
    )


def _metric_scalar(results: Dict, name: str) -> float:
    v = results[name]
    arr = np.asarray(v, dtype=np.float64)
    return float(np.nanmean(arr)) if arr.ndim else float(arr)


def _pick_best(scored: Sequence[Tuple[float, str]]) -> Tuple[float, str]:
    """Best (score, ckpt) with nan-safe ordering.

    nan scores (e.g. an undertrained selection head rejecting every pixel ->
    empty in-coverage confusion matrix, the reference's epoch-1 `valid_acc
    nan` situation) must never win, and an all-nan fold falls back to the
    most-trained (highest-epoch) checkpoint instead of whatever max() happens
    to return under nan comparisons."""
    best = max(scored, key=lambda t: -np.inf if np.isnan(t[0]) else t[0])
    return scored[-1] if np.isnan(best[0]) else best


def _load_row_cache(path: str, meta: Dict) -> Optional[Dict]:
    """Load a completed-cell row if its cache matches ``meta`` exactly."""
    import json

    try:
        with open(path) as f:
            payload = json.load(f)
    except (OSError, ValueError):
        return None
    if payload.get("meta") != meta:
        return None
    return payload["row"]


def _save_row_cache(path: str, meta: Dict, row: Dict) -> None:
    import json

    if jax.process_index() != 0:
        return  # one writer per fleet (same discipline as checkpoints/CSVs)
    tmp = f"{path}.{os.getpid()}.tmp"  # unique tmp: two grids can share a root
    with open(tmp, "w") as f:
        json.dump({"meta": meta, "row": row}, f)
    os.replace(tmp, path)


def _fleet_cache_decision(path: str, meta: Dict,
                          local_row: Optional[Dict]) -> Optional[Dict]:
    """Make the cache hit/miss branch fleet-coherent.

    The miss branch runs train()/evaluate() collectives, so processes
    disagreeing on hit vs miss (shared-filesystem attribute staleness) would
    deadlock the fleet. Host 0's read is authoritative: its decision is
    broadcast; a host told "hit" that cannot read the row itself retries
    briefly, then fails loudly instead of desynchronizing."""
    import time

    from jax.experimental import multihost_utils

    hit = multihost_utils.broadcast_one_to_all(
        np.asarray(local_row is not None, np.int32))
    if not bool(hit):
        return None
    for _ in range(20):
        if local_row is not None:
            return local_row
        time.sleep(0.5)
        local_row = _load_row_cache(path, meta)
    raise RuntimeError(
        f"fleet cache desync: host 0 reports a completed row at {path} but "
        f"it is unreadable on process {jax.process_index()}")


def _eval_single_checkpoint(cfg: EvalConfig, ckpt_path: str, loader) -> Dict:
    """Score one specific checkpoint (evaluate() discovers every checkpoint in
    model_dir, so the file is linked alone into a temp dir)."""
    with tempfile.TemporaryDirectory() as d:
        link = os.path.join(d, os.path.basename(ckpt_path))
        try:
            os.symlink(os.path.abspath(ckpt_path), link)
        except OSError:  # filesystems without symlink support
            import shutil

            shutil.copy(ckpt_path, link)
        return evaluate(replace(cfg, model_dir=d), loader=loader, verbose=False)


def _spawn_cell(cmd: List[str]) -> int:
    """Run one grid cell as a child process (module-level for test stubbing);
    stdout/stderr stream through so cell progress stays visible."""
    import subprocess

    # make the package importable in the child regardless of cwd/install state
    env = dict(os.environ)
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(cmd, env=env).returncode


def _run_cell_isolated(
    spec: Dict,
    cache_path: str,
    cache_meta: Dict,
    cell_retries: int,
    cell_retry_delay: float,
    verbose: bool,
) -> Dict:
    """Execute one (variant, fold) cell in a fresh child interpreter.

    Motivation (CLAUDE.md hazards / the round-3 grid): the TPU-tunnel client
    leaks ~10 GB host RSS per train+eval sweep cell, so multi-hour grids get
    OOM-killed; the round-3 artifact was produced by an EXTERNAL bash retry
    wrapper around the whole driver. This builds the same survival pattern
    into the harness: every cell runs in its own process (RSS resets at cell
    exit), the child persists its result through the ordinary per-cell row
    cache, and a killed child (OOM, wedged device claim) is retried after a
    cool-down — the cell's train() auto-resume means retries only pay for the
    epochs the dead child hadn't finished.
    """
    import json
    import sys
    import tempfile
    import time

    fd, spec_path = tempfile.mkstemp(suffix=".json", prefix="snet_cell_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(spec, f)
        cmd = [sys.executable, "-m",
               "selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep",
               "--cell_spec", spec_path]
        last_rc = None
        for attempt in range(cell_retries + 1):
            if attempt and verbose:
                print(f"[{spec['variant']['name']} fold {spec['fold']}] child "
                      f"exited rc={last_rc} without a row; retry "
                      f"{attempt}/{cell_retries} after {cell_retry_delay:.0f}s "
                      f"cool-down (device claim may need to clear)", flush=True)
            if attempt:
                time.sleep(cell_retry_delay)
            last_rc = _spawn_cell(cmd)
            row = _load_row_cache(cache_path, cache_meta)
            if row is not None:
                return row
        raise RuntimeError(
            f"isolated sweep cell {spec['variant']['name']}/fold "
            f"{spec['fold']} produced no result row after "
            f"{cell_retries + 1} attempts (last child exit code {last_rc}); "
            f"expected row cache at {cache_path}")
    finally:
        try:
            os.unlink(spec_path)
        except OSError:
            pass


def _cell_main(spec_path: str) -> None:
    """Child entry for --cell_spec: run exactly one grid cell inline."""
    import json

    with open(spec_path) as f:
        spec = json.load(f)
    if spec.get("platform"):
        # the env var alone cannot override the session's pinned platform
        # (a sitecustomize imports jax first — verified: JAX_PLATFORMS=cpu in
        # a fresh child still yields the TPU); config.update after import is
        # the reliable mechanism
        jax.config.update("jax_platforms", spec["platform"])
    v = spec["variant"]
    run_sweep(
        spec["data_dir"], spec["model_root"], folds=[spec["fold"]],
        variants=[Variant(v["name"], train_kw=v.get("train_kw") or {},
                          eval_kw=v.get("eval_kw") or {},
                          data_dir=v.get("data_dir"))],
        train_overrides=spec.get("train_overrides"),
        eval_overrides=spec.get("eval_overrides"),
        select_metric=spec.get("select_metric", "mIoU"),
        select_overrides=spec.get("select_overrides"),
        save_dir=None,  # the parent owns the grid-level CSV
    )


def run_sweep(
    data_dir: str,
    model_root: str,
    folds: Sequence[int] = (1, 2, 3, 4, 5),
    variants: Optional[Sequence[Variant]] = None,
    train_overrides: Optional[dict] = None,
    eval_overrides: Optional[dict] = None,
    select_metric: str = "mIoU",
    select_overrides: Optional[dict] = None,
    save_dir: Optional[str] = None,
    verbose: bool = True,
    isolate_cells: bool = False,
    cell_platform: Optional[str] = None,
    cell_retries: int = 2,
    cell_retry_delay: float = 60.0,
) -> List[Dict]:
    """Run the full grid; returns one result dict per (variant, fold) plus a
    ``fold='mean'`` nanmean summary per variant. Writes ``sweep_summary.csv``
    under ``save_dir`` when given.

    ``select_overrides``: EvalConfig deltas applied ONLY to the best-epoch
    SELECTION stage (the valid-split scoring), on top of ``eval_overrides``.
    Crucial when reporting in-coverage metrics (``select_eval=True``):
    selecting the best epoch by an in-coverage metric is DEGENERATE — an
    undertrained selection head that rejects nearly every pixel leaves only
    trivially-easy ones in coverage, so epoch 1 scores a meaningless ~1.0
    and wins (measured; the reference hand-picked epochs from plain valid
    curves instead, u-net_testing.ipynb cells 21-60). Pass
    ``select_overrides={'select_eval': False}`` to select on
    without-selection quality and still REPORT in-coverage.

    ``isolate_cells``: run every (variant, fold) cell in a fresh child
    interpreter (see _run_cell_isolated — survives the TPU-tunnel client's
    ~10 GB-per-cell host RSS leak without an external retry wrapper). The
    parent is moved onto the CPU platform so the children own the device
    claim; overrides must be JSON-serializable (no tuples — their repr in
    the row-cache key would change across the JSON round trip).
    ``cell_platform`` forces the CHILD's jax platform (tests use 'cpu');
    ``cell_retries``/``cell_retry_delay`` bound the per-cell retry loop."""
    variants = tuple(variants) if variants is not None else default_grid()
    train_overrides = dict(train_overrides or {})
    eval_overrides = dict(eval_overrides or {})
    if isolate_cells:
        try:
            # keep the parent off the (exclusive) TPU-tunnel device claim;
            # a no-op when the backend is already initialized on cpu
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001 — backend already initialized
            # If the parent already holds a non-cpu backend, every isolated
            # child would hang on its own exclusive device claim and burn
            # the full retry budget per cell — fail immediately instead.
            if jax.default_backend() != "cpu":
                raise RuntimeError(
                    "isolate_cells=True requires the parent process to stay "
                    "off the device backend, but jax is already initialized "
                    f"on '{jax.default_backend()}' (e.g. a prior evaluate()/"
                    "train() call in this process). Run the sweep from a "
                    "fresh process, or pass isolate_cells=False.")
        if jax.process_count() > 1:
            raise ValueError(
                "isolate_cells and a multi-process fleet are exclusive; "
                "fleets already restart-resume via the per-cell row caches")

    rows: List[Dict] = []
    for variant in variants:
        v_data_dir = variant.data_dir or data_dir
        per_fold: List[Dict] = []
        for fold in folds:
            model_dir = os.path.join(model_root, variant.name)
            t_cfg = TrainConfig(
                data_dir=v_data_dir, fold=fold, model_dir=model_dir,
                **{**variant.train_kw, **train_overrides},
            )
            requested_epochs = int(t_cfg.n_epoch)
            ckpt_dir = os.path.join(model_dir, f"{fold}-fold", "checkpoint")

            # Completed-cell cache: long grids are restartable at zero cost
            # (a multi-hour run killed near the end — e.g. by the host OOM
            # killer, observed at ~10 GB host RSS growth per cell over the
            # TPU tunnel — resumes by reloading finished rows instead of
            # re-scoring every checkpoint).
            cache_path = os.path.join(model_dir, f"{fold}-fold",
                                      "sweep_row.json")
            cache_meta = {
                "requested_epochs": requested_epochs,
                "select_metric": select_metric,
                "eval_overrides": {k: repr(v)
                                   for k, v in sorted(eval_overrides.items())},
                "select_overrides": {k: repr(v) for k, v in
                                     sorted((select_overrides or {}).items())},
                # a same-named variant redefined with different settings, a
                # changed training recipe (e.g. --selective flipped on the
                # same model_root), or a swapped dataset must all invalidate,
                # not silently reuse
                "variant_eval_kw": {k: repr(v) for k, v in
                                    sorted(variant.eval_kw.items())},
                "train_kw": {k: repr(v) for k, v in
                             sorted({**variant.train_kw,
                                     **train_overrides}.items())},
                "data_dir": v_data_dir,
            }
            cached = _load_row_cache(cache_path, cache_meta)
            if jax.process_count() > 1:
                cached = _fleet_cache_decision(cache_path, cache_meta, cached)
            if cached is not None:
                per_fold.append(cached)
                rows.append(cached)
                if verbose:
                    print(f"[{variant.name} fold {fold}] cached row "
                          f"(best epoch {cached['best_epoch']}, test mIoU="
                          f"{cached['mIoU']:.4f})", flush=True)
                continue
            if isolate_cells:
                spec = {
                    "data_dir": data_dir, "model_root": model_root,
                    "fold": fold,
                    "variant": {"name": variant.name,
                                "train_kw": variant.train_kw,
                                "eval_kw": variant.eval_kw,
                                "data_dir": variant.data_dir},
                    "train_overrides": train_overrides,
                    "eval_overrides": eval_overrides,
                    "select_overrides": select_overrides,
                    "select_metric": select_metric,
                    "platform": cell_platform,
                }
                row = _run_cell_isolated(spec, cache_path, cache_meta,
                                         cell_retries, cell_retry_delay,
                                         verbose)
                per_fold.append(row)
                rows.append(row)
                if verbose:
                    print(f"[{variant.name} fold {fold}] isolated cell done "
                          f"(best epoch {row['best_epoch']}, test mIoU="
                          f"{row['mIoU']:.4f})", flush=True)
                continue
            # Remaining epochs come from the digit-LATEST epoch, which is
            # where train() resumes — a file COUNT would overtrain whenever
            # the dir is non-contiguous (e.g. pruned by --keep_ckpt).
            # verify=False: only the epoch NUMBER is needed here; a full
            # loadability parse per cell is the dominant host cost of grid
            # resume probing (a corrupt file still fails loudly at scoring)
            latest = latest_checkpoint(ckpt_dir, verify=False)
            done = latest[1] if latest else 0
            if done < t_cfg.n_epoch:  # auto-resume fills the remainder
                t_cfg = replace(t_cfg, n_epoch=t_cfg.n_epoch - done)
                train(t_cfg, verbose=False)

            e_kwargs = dict(
                data_dir=v_data_dir, test_fold=fold, model_dir=ckpt_dir,
                model_arch=[t_cfg.model_arch], selective=t_cfg.selective,
                patch_mag=t_cfg.patch_mag, patch_size=t_cfg.patch_size,
                batch_size=t_cfg.batch_size, compute_dtype=t_cfg.compute_dtype,
                num_workers=t_cfg.num_workers, seed=t_cfg.seed,
            )
            e_kwargs.update(variant.eval_kw)
            e_kwargs.update(eval_overrides)
            e_cfg = EvalConfig(**e_kwargs)
            s_kwargs = dict(e_kwargs)
            s_kwargs.update(select_overrides or {})
            s_cfg = EvalConfig(**s_kwargs)

            # best-epoch selection on the fold's VALIDATION split
            mesh = make_mesh(e_cfg.n_devices)
            _, valid_list = construct_train_valid(
                v_data_dir, test_fold=fold, seed=t_cfg.seed
            )
            valid_loader = make_eval_loader(s_cfg, mesh, data_list=valid_list)
            ckpts = sorted(list_checkpoints(ckpt_dir),
                           key=lambda p: _epoch_of(os.path.basename(p)))
            scored = []
            for ckpt in ckpts:
                res = _eval_single_checkpoint(s_cfg, ckpt, valid_loader)
                scored.append((_metric_scalar(res, select_metric), ckpt))
            best_score, best_ckpt = _pick_best(scored)
            if not s_cfg.select_eval and any(
                not np.isnan(s) and s > 0.999 for s, _ in scored
            ) and t_cfg.selective:
                # a without-selection score this perfect usually means the
                # selection stage is not scoring what you think (e.g. a stale
                # process racing this workdir, or in-coverage leakage) —
                # surface it instead of silently reporting a degenerate pick
                print(f"WARNING: near-perfect without-selection valid score "
                      f"{max(s for s, _ in scored):.4f} for "
                      f"{variant.name}/fold{fold} — verify the selection "
                      f"stage", flush=True)

            # report the winner on the TEST split
            test_loader = make_eval_loader(e_cfg, mesh)
            results = _eval_single_checkpoint(e_cfg, best_ckpt, test_loader)
            row = {
                "variant": variant.name,
                "fold": fold,
                "best_epoch": _epoch_of(os.path.basename(best_ckpt)),
                f"valid_{select_metric}": best_score,
                "accuracy": results["accuracy"],
                "accuracy_class": results["accuracy_class"],
                "precision": np.asarray(results["precision"]).tolist(),
                "recall": np.asarray(results["recall"]).tolist(),
                "f1_score": np.asarray(results["f1_score"]).tolist(),
                "mIoU": results["mIoU"],
                "IoU_class": np.asarray(results["IoU_class"]).tolist(),
            }
            if "rejection_ratio" in results:
                row["rejection_ratio"] = results["rejection_ratio"]
            _save_row_cache(cache_path, cache_meta, row)
            per_fold.append(row)
            rows.append(row)
            if verbose:
                print(f"[{variant.name} fold {fold}] best epoch "
                      f"{row['best_epoch']} valid_{select_metric}="
                      f"{best_score:.4f} test mIoU={row['mIoU']:.4f}",
                      flush=True)

        # per-variant nanmean summary (the notebook's aggregation)
        summary = {"variant": variant.name, "fold": "mean",
                   "best_epoch": "", f"valid_{select_metric}": ""}
        for key in ("accuracy", "accuracy_class", "mIoU"):
            summary[key] = float(np.nanmean([r[key] for r in per_fold]))
        for key in ("precision", "recall", "f1_score", "IoU_class"):
            summary[key] = np.nanmean(
                np.asarray([r[key] for r in per_fold], dtype=np.float64), axis=0
            ).tolist()
        if any("rejection_ratio" in r for r in per_fold):
            summary["rejection_ratio"] = float(np.nanmean(
                [r.get("rejection_ratio", np.nan) for r in per_fold]
            ))
        rows.append(summary)
        if verbose:
            print(f"[{variant.name} mean] mIoU={summary['mIoU']:.4f}", flush=True)

    if save_dir and jax.process_index() == 0:  # one CSV writer per fleet
        header = ["variant", "fold", "best_epoch", "accuracy", "accuracy_class",
                  "precision", "recall", "f1_score", "mIoU", "IoU_class",
                  "rejection_ratio"]
        csv_rows = []
        for r in rows:
            csv_rows.append([
                r.get("variant"), r.get("fold"), r.get("best_epoch"),
                r.get("accuracy"), r.get("accuracy_class"),
                " ".join(f"{v:.6f}" for v in np.atleast_1d(r.get("precision", []))),
                " ".join(f"{v:.6f}" for v in np.atleast_1d(r.get("recall", []))),
                " ".join(f"{v:.6f}" for v in np.atleast_1d(r.get("f1_score", []))),
                r.get("mIoU"),
                " ".join(f"{v:.6f}" for v in np.atleast_1d(r.get("IoU_class", []))),
                r.get("rejection_ratio", ""),
            ])
        save_performance_as_csv(save_dir, csv_rows, "sweep_summary", header=header)
    return rows


def main(argv=None) -> None:
    """CLI: python -m selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep"""
    import argparse
    import sys

    raw = list(argv) if argv is not None else sys.argv[1:]
    if "--cell_spec" in raw:  # child re-entry: run exactly one grid cell
        _cell_main(raw[raw.index("--cell_spec") + 1])
        return

    parser = argparse.ArgumentParser(
        description="fold x variant experiment-grid sweep with best-epoch "
                    "selection and CSV summary")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--model_root", required=True)
    parser.add_argument("--folds", type=int, nargs="+", default=[1, 2, 3, 4, 5])
    parser.add_argument("--variants", nargs="+",
                        default=[v.name for v in default_grid()],
                        help="subset of: " + " ".join(v.name for v in default_grid()))
    parser.add_argument("--model_arch", default="UNet_B")
    parser.add_argument("--selective", type=parse_bool, default=False)
    parser.add_argument("--select_eval", type=parse_bool, default=False)
    parser.add_argument("--loss", default="BCElogit")
    parser.add_argument("--n_epoch", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--patch_size", type=int, default=256)
    parser.add_argument("--patch_mag", type=int, default=200)
    parser.add_argument("--num_workers", type=int, default=16)
    parser.add_argument("--select_metric", default="mIoU")
    parser.add_argument("--save_dir", default=None)
    parser.add_argument("--isolate_cells", type=parse_bool, default=False,
                        help="run each (variant, fold) cell in a fresh child "
                             "process with retries — survives the TPU-tunnel "
                             "client's per-cell host RSS leak on long grids")
    parser.add_argument("--cell_retries", type=int, default=2)
    parser.add_argument("--cell_retry_delay", type=float, default=60.0)
    args = parser.parse_args(raw)

    by_name = {v.name: v for v in default_grid()}
    unknown = [n for n in args.variants if n not in by_name]
    if unknown:
        parser.error(f"unknown variants {unknown}; choose from {sorted(by_name)}")

    run_sweep(
        args.data_dir, args.model_root, folds=args.folds,
        variants=[by_name[n] for n in args.variants],
        train_overrides=dict(
            model_arch=args.model_arch, selective=args.selective, loss=args.loss,
            n_epoch=args.n_epoch, batch_size=args.batch_size,
            patch_size=args.patch_size, patch_mag=args.patch_mag,
            num_workers=args.num_workers,
        ),
        eval_overrides=dict(select_eval=args.select_eval),
        # always select the best epoch on without-selection quality — the
        # in-coverage metric is degenerate for selection (see run_sweep)
        select_overrides=dict(select_eval=False),
        select_metric=args.select_metric,
        save_dir=args.save_dir,
        isolate_cells=args.isolate_cells,
        cell_retries=args.cell_retries,
        cell_retry_delay=args.cell_retry_delay,
    )


if __name__ == "__main__":
    main()
