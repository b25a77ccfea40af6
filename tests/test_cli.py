"""Console entry-point tests (cli.py + repo-root shims).

The reference is driven as ``python3 train.py`` / ``python3 eval.py``
(reference README.md:28-68); cli.py re-exposes the same drivers as installed
commands. The root shims must stay thin delegates so the two surfaces cannot
drift.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestShimsDelegate:
    def test_root_scripts_are_cli_functions(self):
        sys.path.insert(0, REPO)
        try:
            import train as train_shim
            import eval as eval_shim
            from selectivenet_for_semantic_segmentation_binary_tpu import cli
        finally:
            sys.path.remove(REPO)
        assert train_shim.main is cli.train_main
        assert eval_shim.main is cli.eval_main

    def test_all_project_scripts_resolve(self):
        import pytest

        tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11 only

        from selectivenet_for_semantic_segmentation_binary_tpu import cli

        with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
            scripts = tomllib.load(f)["project"]["scripts"]
        assert len(scripts) >= 6
        for name, target in scripts.items():
            mod, func = target.split(":")
            assert mod == "selectivenet_for_semantic_segmentation_binary_tpu.cli"
            assert callable(getattr(cli, func)), f"{name} -> {target} missing"


class TestHelpSurface:
    """--help must work without touching devices (argparse exits first)."""

    def _help(self, script):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, script), "--help"],
            capture_output=True, text=True, timeout=120, cwd=REPO,
        )
        assert out.returncode == 0, out.stderr
        return out.stdout

    def test_train_help_lists_reference_flags(self):
        h = self._help("train.py")
        for flag in ("--fold", "--model_arch", "--selective", "--s_lamb",
                     "--local_rank", "--keep_ckpt"):
            assert flag in h

    def test_eval_help_lists_reference_flags(self):
        h = self._help("eval.py")
        for flag in ("--test_fold", "--select_eval", "--cut_off",
                     "--s_cut_off", "--ens_scale"):
            assert flag in h

    def test_output_dim_nchw_rejected_loudly(self):
        """--output_dim NCHW is an error, not a silent no-op: the flag chose
        the reference's host numpy conversion (train.py:141-144), which this
        NHWC-native framework does not have (docs/PARITY.md)."""
        import pytest

        from selectivenet_for_semantic_segmentation_binary_tpu.config import (
            EvalConfig,
            TrainConfig,
            parse_eval_args,
            parse_train_args,
            validate_output_dim,
        )

        with pytest.raises(SystemExit):
            parse_train_args(["--output_dim", "NCHW"])
        with pytest.raises(SystemExit):
            parse_eval_args(["--output_dim", "NCHW"])
        # the default keeps parsing
        assert parse_train_args([]).output_dim == "NHW"
        assert parse_eval_args([]).output_dim == "NHW"
        # library users constructing configs directly hit the same guard
        with pytest.raises(ValueError, match="NHWC-native"):
            validate_output_dim(TrainConfig(output_dim="NCHW"))
        validate_output_dim(EvalConfig())  # default passes

    def test_fused_cbr_on_raises_when_unavailable(self):
        """--fused_cbr on must fail loudly where the Pallas trunk cannot run
        (CPU backend here), never silently resolve off — a no-op experiment
        flag corrupts experiment conclusions (train_lib.resolve_fused)."""
        import pytest

        from selectivenet_for_semantic_segmentation_binary_tpu.config import (
            TrainConfig,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            resolve_fused,
        )

        mesh = make_mesh(1)
        with pytest.raises(ValueError, match="fused_cbr"):
            resolve_fused(TrainConfig(fused_cbr="on"), mesh)
        # auto/off still resolve quietly everywhere
        assert resolve_fused(TrainConfig(fused_cbr="auto"), mesh) is False
        assert resolve_fused(TrainConfig(fused_cbr="off"), mesh) is False

    def test_sweep_help_lists_grid_flags(self):
        out = subprocess.run(
            [sys.executable, "-m",
             "selectivenet_for_semantic_segmentation_binary_tpu.tools.sweep",
             "--help"],
            capture_output=True, text=True, timeout=120, cwd=REPO,
        )
        assert out.returncode == 0, out.stderr
        for flag in ("--folds", "--variants", "--select_metric",
                     "--isolate_cells", "--cell_retries"):
            assert flag in out.stdout
