"""snet-export tests: AOT StableHLO serving artifacts (tools/export.py).

The reference has no deployment artifact (inference requires the full torch
checkout + checkpoint, u-net_testing.ipynb); jax.export freezing is a
framework extension. These tests pin the serialize/deserialize roundtrip
against the live forward, the sidecar contract, and the CLI surface.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.predictor import Predictor
from selectivenet_for_semantic_segmentation_binary_tpu.tools import export as export_cli
from selectivenet_for_semantic_segmentation_binary_tpu.tools.export import (
    export_serving,
    load_exported,
    make_serving_fn,
)
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    save_checkpoint,
)


def _make_ckpt(d: str, selective: bool, arch: str = "UNet_B") -> str:
    model = build_model(arch, selective=selective, compute_dtype="float32")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
    )
    variables = jax.device_get(variables)
    save_checkpoint(str(d), {"net": {
        "params": variables["params"], "batch_stats": variables["batch_stats"],
    }, "epoch": 1}, 1)
    return os.path.join(str(d), "model_epoch1.ckpt")


@pytest.fixture(scope="module")
def sel_predictor(tmp_path_factory):
    ckpt = _make_ckpt(tmp_path_factory.mktemp("export_ckpt"), selective=True)
    return Predictor(ckpt, selective=True, compute_dtype="float32")


class TestRoundtrip:
    def test_artifact_reproduces_live_forward(self, sel_predictor, tmp_path):
        blob = export_serving(sel_predictor, batch=2, height=32, width=40,
                              channels=3)
        path = str(tmp_path / "m.shlo")
        with open(path, "wb") as f:
            f.write(blob)
        exported = load_exported(path)

        rng = np.random.default_rng(1)
        x = rng.random((2, 32, 40, 3)).astype(np.float32)
        got = exported.call(x)
        want = make_serving_fn(sel_predictor.model, sel_predictor.variables,
                               selective=True)(x)
        assert sorted(got) == ["prob", "selection_prob"]
        for k in want:
            arr = np.asarray(got[k])
            assert arr.shape == (2, 32, 40)
            assert arr.dtype == np.float32
            np.testing.assert_allclose(arr, np.asarray(want[k]), atol=1e-5)
            assert arr.min() >= 0.0 and arr.max() <= 1.0  # post-activation

    def test_non_selective_exports_prob_only(self, tmp_path):
        ckpt = _make_ckpt(tmp_path, selective=False)
        predictor = Predictor(ckpt, selective=False, compute_dtype="float32")
        blob = export_serving(predictor, batch=1, height=16, width=16,
                              channels=3)
        from jax import export as jax_export

        exported = jax_export.deserialize(bytearray(blob))
        out = exported.call(np.zeros((1, 16, 16, 3), np.float32))
        assert sorted(out) == ["prob"]

    def test_rejects_off_grid_and_bad_batch(self, sel_predictor):
        with pytest.raises(ValueError, match="multiples of 8"):
            export_serving(sel_predictor, batch=1, height=20, width=16,
                           channels=3)
        with pytest.raises(ValueError, match="batch"):
            export_serving(sel_predictor, batch=0, height=16, width=16,
                           channels=3)

    def test_wrong_input_shape_is_rejected_at_call(self, sel_predictor):
        blob = export_serving(sel_predictor, batch=1, height=16, width=16,
                              channels=3)
        from jax import export as jax_export

        exported = jax_export.deserialize(bytearray(blob))
        with pytest.raises(Exception):  # static shapes are the contract
            exported.call(np.zeros((1, 24, 24, 3), np.float32))


class TestCLI:
    def test_end_to_end_with_check(self, tmp_path, capsys):
        ckpt = _make_ckpt(tmp_path, selective=True)
        out = str(tmp_path / "unet.shlo")
        export_cli.main([
            "--out", out, "--model_path", ckpt, "--selective", "1",
            "--compute_dtype", "float32", "--batch", "1",
            "--height", "16", "--width", "16", "--check", "1",
        ])
        text = capsys.readouterr().out
        assert "check ok" in text
        assert os.path.exists(out)

        with open(out + ".json") as f:
            meta = json.load(f)
        assert meta["input_shape"] == [1, 16, 16, 3]
        assert meta["selective"] is True
        assert meta["outputs"] == {"prob": [1, 16, 16],
                                   "selection_prob": [1, 16, 16]}
        assert meta["platforms"] == [jax.default_backend()]
        assert meta["size_bytes"] == os.path.getsize(out)
        assert meta["jax_version"] == jax.__version__

        # the artifact is loadable standalone (sidecar-described convention)
        exported = load_exported(out)
        res = exported.call(np.zeros((1, 16, 16, 3), np.float32))
        assert np.asarray(res["prob"]).shape == (1, 16, 16)

    def test_check_skipped_for_foreign_platform(self, tmp_path, capsys):
        ckpt = _make_ckpt(tmp_path, selective=False)
        out = str(tmp_path / "unet_tpu.shlo")
        foreign = "tpu" if jax.default_backend() != "tpu" else "cuda"
        export_cli.main([
            "--out", out, "--model_path", ckpt,
            "--compute_dtype", "float32", "--batch", "1",
            "--height", "16", "--width", "16",
            "--platforms", foreign, "--check", "1",
        ])
        text = capsys.readouterr().out
        assert "check skipped" in text
        assert os.path.exists(out) and os.path.exists(out + ".json")

    def test_gh_channel_count(self, tmp_path):
        """GH checkpoints export 2-channel inputs."""
        model = build_model("UNet_B", selective=False, compute_dtype="float32")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)), train=False
        )
        variables = jax.device_get(variables)
        save_checkpoint(str(tmp_path), {"net": {
            "params": variables["params"],
            "batch_stats": variables["batch_stats"],
        }, "epoch": 1}, 1)
        ckpt = os.path.join(str(tmp_path), "model_epoch1.ckpt")
        out = str(tmp_path / "gh.shlo")
        export_cli.main([
            "--out", out, "--model_path", ckpt, "--input_type", "GH",
            "--compute_dtype", "float32", "--batch", "1",
            "--height", "16", "--width", "16", "--check", "1",
        ])
        with open(out + ".json") as f:
            meta = json.load(f)
        assert meta["input_shape"] == [1, 16, 16, 2]

    def test_rejects_bad_flags(self, tmp_path):
        ckpt = _make_ckpt(tmp_path, selective=False)
        with pytest.raises(SystemExit):
            export_cli.main(["--out", str(tmp_path / "x.shlo"),
                             "--model_path", ckpt, "--height", "20",
                             "--width", "16"])
        with pytest.raises(SystemExit):
            export_cli.main(["--out", str(tmp_path / "x.shlo"),
                             "--model_path", ckpt, "--batch", "0"])
        with pytest.raises(SystemExit):  # no checkpoint source
            export_cli.main(["--out", str(tmp_path / "x.shlo")])
