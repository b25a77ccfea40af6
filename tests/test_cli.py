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
