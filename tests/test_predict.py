"""snet-predict / snet-wsi CLI tests.

The reference's standalone-inference notebooks (u-net_inference.ipynb,
check_wsi-level_mask.ipynb) were stripped from the repo
(.MISSING_LARGE_BLOBS:1-3); tools/predict.py and tools/wsi.py::main are their
command-line reconstruction. These tests drive both CLIs in-process end to
end on synthetic data.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.tools import predict as predict_cli
from selectivenet_for_semantic_segmentation_binary_tpu.tools import wsi as wsi_cli
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    save_checkpoint,
)


def _make_ckpt(d: str, selective: bool, in_ch: int = 3,
               arch: str = "UNet_B") -> str:
    model = build_model(arch, selective=selective, compute_dtype="float32")
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, in_ch)), train=False
    )
    variables = jax.device_get(variables)
    save_checkpoint(str(d), {"net": {
        "params": variables["params"], "batch_stats": variables["batch_stats"],
    }, "epoch": 3}, 3)
    return os.path.join(str(d), "model_epoch3.ckpt")


@pytest.fixture(scope="module")
def sel_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("predict_ckpt")
    return _make_ckpt(d, selective=True)


@pytest.fixture(scope="module")
def image_file(tmp_path_factory):
    """A 36x44 RGB PNG — deliberately NOT divisible by the pool grid (8)."""
    d = tmp_path_factory.mktemp("predict_imgs")
    rng = np.random.default_rng(0)
    arr = (rng.random((36, 44, 3)) * 255).astype(np.uint8)
    path = os.path.join(str(d), "tile.png")
    Image.fromarray(arr).save(path)
    return path


class TestPredictCLI:
    def test_whole_image_off_grid(self, sel_ckpt, image_file, tmp_path):
        out_dir = str(tmp_path / "out")
        predict_cli.main([
            image_file, "--model_path", sel_ckpt, "--selective", "1",
            "--compute_dtype", "float32", "--save_dir", out_dir,
            "--save_prob", "1", "--heatmap", "0",
        ])
        prob = np.load(os.path.join(out_dir, "tile_prob.npy"))
        assert prob.shape == (36, 44)  # cropped back from the padded 40x48
        assert prob.dtype == np.float32
        assert 0.0 <= prob.min() and prob.max() <= 1.0
        pred = np.asarray(Image.open(os.path.join(out_dir, "tile_pred.png")))
        assert pred.shape == (36, 44)
        assert set(np.unique(pred)) <= {0, 255}
        sel = np.asarray(Image.open(os.path.join(out_dir, "tile_selection.png")))
        assert sel.shape == (36, 44)
        assert set(np.unique(sel)) <= {0, 255}

    def test_tiled_matches_whole(self, sel_ckpt, tmp_path):
        """--tile is the EXACT bounded-memory path: same probabilities."""
        rng = np.random.default_rng(1)
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        img = os.path.join(str(tmp_path), "big.png")
        Image.fromarray(arr).save(img)

        whole_dir, tiled_dir = str(tmp_path / "whole"), str(tmp_path / "tiled")
        base = [img, "--model_path", sel_ckpt, "--selective", "1",
                "--compute_dtype", "float32", "--save_prob", "1",
                "--heatmap", "0"]
        predict_cli.main(base + ["--save_dir", whole_dir])
        predict_cli.main(base + ["--save_dir", tiled_dir, "--tile", "32", "32"])
        np.testing.assert_allclose(
            np.load(os.path.join(whole_dir, "big_prob.npy")),
            np.load(os.path.join(tiled_dir, "big_prob.npy")),
            rtol=1e-5, atol=1e-5,
        )

    def test_ce_head_unet_whole_and_tiled(self, tmp_path, image_file):
        """The CE-family UNet (n_cls softmax head, reference model.py:106-191)
        serves through the same CLI: tumor prob = softmax class-1 plane,
        whole-image and tiled paths agree."""
        ckpt = _make_ckpt(tmp_path, selective=False, arch="UNet")
        whole, tiled = str(tmp_path / "whole"), str(tmp_path / "tiled")
        base = [image_file, "--model_path", ckpt, "--model_arch", "UNet",
                "--compute_dtype", "float32", "--save_prob", "1",
                "--heatmap", "0"]
        predict_cli.main(base + ["--save_dir", whole])
        predict_cli.main(base + ["--save_dir", tiled, "--tile", "24", "24"])
        a = np.load(os.path.join(whole, "tile_prob.npy"))
        b = np.load(os.path.join(tiled, "tile_prob.npy"))
        assert a.shape == (36, 44)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_shard_windows_matches_single_chip(self, sel_ckpt, tmp_path):
        """--shard_windows shards tiled window batches over the (virtual
        8-device) mesh; window DP involves zero cross-chip math, so the
        probability maps must match the unsharded run exactly."""
        rng = np.random.default_rng(6)
        img = os.path.join(str(tmp_path), "big.png")
        Image.fromarray((rng.random((96, 96, 3)) * 255).astype(
            np.uint8)).save(img)
        base = [img, "--model_path", sel_ckpt, "--selective", "1",
                "--compute_dtype", "float32", "--save_prob", "1",
                "--heatmap", "0", "--tile", "32", "32"]
        solo, mesh = str(tmp_path / "solo"), str(tmp_path / "mesh")
        predict_cli.main(base + ["--save_dir", solo])
        predict_cli.main(base + ["--save_dir", mesh, "--shard_windows", "1"])
        np.testing.assert_array_equal(
            np.load(os.path.join(solo, "big_prob.npy")),
            np.load(os.path.join(mesh, "big_prob.npy")))

    def test_shard_windows_requires_tile(self, sel_ckpt, image_file):
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--shard_windows", "1"])

    def test_gh_input_type(self, tmp_path, image_file):
        """GH checkpoints (2-channel trunk) serve RGB images via the stain
        transform (reference data_utils.py:13-27)."""
        ckpt = _make_ckpt(tmp_path, selective=False, in_ch=2)
        out_dir = str(tmp_path / "out")
        predict_cli.main([
            image_file, "--model_path", ckpt, "--input_type", "GH",
            "--compute_dtype", "float32", "--save_dir", out_dir,
            "--heatmap", "0",
        ])
        pred = np.asarray(Image.open(os.path.join(out_dir, "tile_pred.png")))
        assert pred.shape == (36, 44)

    def test_h_rgb_input_type(self, sel_ckpt, tmp_path, image_file):
        """--input_type H_RGB re-renders the Hematoxylin plane back to a
        3-channel RGB input (reference data_utils.py:29-41) before the
        forward; the prediction inputs must differ from the plain-RGB run."""
        from selectivenet_for_semantic_segmentation_binary_tpu.data.stain import (
            H_RGB,
        )

        rgb_dir, h_dir = str(tmp_path / "rgb"), str(tmp_path / "hrgb")
        base = [image_file, "--model_path", sel_ckpt, "--selective", "1",
                "--compute_dtype", "float32", "--save_prob", "1",
                "--heatmap", "0"]
        predict_cli.main(base + ["--save_dir", rgb_dir])
        predict_cli.main(base + ["--save_dir", h_dir,
                                 "--input_type", "H_RGB"])
        a = np.load(os.path.join(rgb_dir, "tile_prob.npy"))
        b = np.load(os.path.join(h_dir, "tile_prob.npy"))
        assert a.shape == b.shape == (36, 44)
        assert not np.array_equal(a, b)  # the stain transform reached the net

        # and the loader applied exactly the reference transform
        raw = np.asarray(Image.open(image_file).convert("RGB"),
                         np.float32) / 255.0
        np.testing.assert_allclose(
            predict_cli._load_image(image_file, "H_RGB"), H_RGB(raw),
            rtol=1e-6, atol=1e-6)

    def test_uncertainty_cli(self, sel_ckpt, image_file, tmp_path):
        """--uncertainty N writes the MC-dropout aggregation artifacts
        (reference check_MC_dropout.ipynb cells 0-4): an npz with
        mean_prob / per-element variance / negated class-mean-variance
        confidence, a variance PNG, and pred/prob derived from the MC
        predictive mean."""
        out_dir = str(tmp_path / "out")
        predict_cli.main([
            image_file, "--model_path", sel_ckpt, "--selective", "1",
            "--compute_dtype", "float32", "--save_dir", out_dir,
            "--uncertainty", "6", "--dropout_rate", "0.3",
            "--save_prob", "1", "--heatmap", "0",
        ])
        z = np.load(os.path.join(out_dir, "tile_uncertainty.npz"))
        assert z["mean_prob"].shape == (36, 44, 1)   # cropped off-grid dims
        assert z["variance"].shape == (36, 44, 1)
        assert z["confidence"].shape == (36, 44)
        assert z["variance"].min() >= 0.0
        assert z["variance"].max() > 0.0  # dropout really perturbed the repeats
        # confidence = negated class-mean variance (ipynb cell 4)
        np.testing.assert_allclose(z["confidence"],
                                   -z["variance"].mean(axis=-1),
                                   rtol=1e-5, atol=1e-7)
        var_png = np.asarray(Image.open(os.path.join(out_dir,
                                                     "tile_variance.png")))
        assert var_png.shape == (36, 44)  # grayscale with --heatmap 0
        # pred/prob come from the MC predictive mean
        prob = np.load(os.path.join(out_dir, "tile_prob.npy"))
        np.testing.assert_allclose(prob, z["mean_prob"][..., 0],
                                   rtol=1e-6, atol=1e-7)
        pred = np.asarray(Image.open(os.path.join(out_dir, "tile_pred.png")))
        assert set(np.unique(pred)) <= {0, 255}

    def test_uncertainty_seed_reproducible(self, sel_ckpt, image_file,
                                           tmp_path):
        """Same --mc_seed -> bit-identical aggregation; a different seed
        draws different dropout masks."""
        dirs = [str(tmp_path / d) for d in ("a", "b", "c")]
        base = [image_file, "--model_path", sel_ckpt, "--selective", "1",
                "--compute_dtype", "float32", "--uncertainty", "4",
                "--dropout_rate", "0.3", "--heatmap", "0"]
        predict_cli.main(base + ["--save_dir", dirs[0], "--mc_seed", "7"])
        predict_cli.main(base + ["--save_dir", dirs[1], "--mc_seed", "7"])
        predict_cli.main(base + ["--save_dir", dirs[2], "--mc_seed", "8"])
        v = [np.load(os.path.join(d, "tile_uncertainty.npz"))["variance"]
             for d in dirs]
        np.testing.assert_array_equal(v[0], v[1])
        assert not np.array_equal(v[0], v[2])

    def test_uncertainty_flag_validation(self, sel_ckpt, image_file):
        """The MC flags fail loudly instead of silently no-oping: N without
        dropout would make every repeat identical (variance 0), dropout
        without N never fires, and --tile has no MC path."""
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--uncertainty", "4"])
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--dropout_rate", "0.3"])
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--uncertainty", "4", "--dropout_rate", "0.3",
                              "--tile", "32", "32"])

    def test_multiclass_pred_png_spaces_gray_levels(self, tmp_path):
        """n_cls > 2 pred PNGs space class ids evenly over gray levels;
        a plain *255 would wrap in uint8 (class 2 -> 254, 3 -> 253)."""
        out = {"pred": np.arange(4, dtype=np.int32).reshape(2, 2),
               "prob": np.zeros((2, 2), np.float32)}
        predict_cli._save_outputs(out, "toy", str(tmp_path), save_prob=False,
                                  heatmap=False, n_cls=4)
        png = np.asarray(Image.open(os.path.join(str(tmp_path),
                                                 "toy_pred.png")))
        assert png.tolist() == [[0, 85], [170, 255]]

    def test_directory_scan_skips_labels_and_outputs(self, sel_ckpt, tmp_path):
        d = tmp_path / "imgs"
        d.mkdir()
        rng = np.random.default_rng(2)
        for name in ("a_input.jpg", "b_input.jpg"):
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
                str(d / name))
        # decoys a directory scan must not feed to the model
        Image.fromarray(np.zeros((32, 32), np.uint8)).save(str(d / "a_label.png"))
        Image.fromarray(np.zeros((32, 32), np.uint8)).save(str(d / "x_pred.png"))
        out_dir = str(tmp_path / "out")
        predict_cli.main([
            str(d), "--model_path", sel_ckpt, "--selective", "1",
            "--compute_dtype", "float32", "--save_dir", out_dir,
            "--heatmap", "0",
        ])
        stems = sorted(f for f in os.listdir(out_dir) if f.endswith("_pred.png"))
        assert stems == ["a_input_pred.png", "b_input_pred.png"]

    def test_model_dir_picks_digit_latest(self, tmp_path, image_file):
        model = build_model("UNet_B", selective=False, compute_dtype="float32")
        variables = jax.device_get(model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False))
        for epoch in (2, 10):  # digit sort: 10 > 2 (lexical sort would fail)
            save_checkpoint(str(tmp_path), {"net": {
                "params": variables["params"],
                "batch_stats": variables["batch_stats"],
            }, "epoch": epoch}, epoch)
        out_dir = str(tmp_path / "out")
        predict_cli.main([
            image_file, "--model_dir", str(tmp_path),
            "--compute_dtype", "float32", "--save_dir", out_dir,
            "--heatmap", "0",
        ])
        assert os.path.exists(os.path.join(out_dir, "tile_pred.png"))

    def test_requires_exactly_one_model_source(self, sel_ckpt, image_file):
        with pytest.raises(SystemExit):
            predict_cli.main([image_file])
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--model_dir", os.path.dirname(sel_ckpt)])

    def test_rejects_bad_tile_and_batch_and_missing_inputs(self, sel_ckpt,
                                                           image_file):
        with pytest.raises(SystemExit):  # zero/negative tile dims
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--tile", "0", "0"])
        with pytest.raises(SystemExit):
            predict_cli.main([image_file, "--model_path", sel_ckpt,
                              "--batch_size", "0"])
        with pytest.raises(FileNotFoundError):  # before any device work
            predict_cli.main(["/nonexistent/typo.png",
                              "--model_path", sel_ckpt])

    def test_prebuilt_bare_array_apply_fn(self, tmp_path):
        """wsi_mask must tuple-normalize a prebuilt apply_fn that returns a
        bare array (natural for non-selective models) — outs[0] of a bare
        (H, W) map would silently be its first row."""
        import jax as _jax

        from selectivenet_for_semantic_segmentation_binary_tpu.tools.tiled_inference import (
            wsi_mask,
        )

        model = build_model("UNet_B", selective=False,
                            compute_dtype="float32")
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), train=False)
        bare_fn = _jax.jit(lambda b: model.apply(variables, b, train=False))
        img = np.random.default_rng(5).random((64, 64, 3)).astype(np.float32)
        out = wsi_mask(None, None, img, tile=(32, 32), apply_fn=bare_fn)
        assert out["prob"].shape == (64, 64)

    def test_blankfield_changes_prediction_inputs(self, sel_ckpt, image_file,
                                                  tmp_path):
        """--blankfield must reach the model: BC-variant checkpoints
        (tools/sweep.py BC/GH_BC) are served white-balanced, like
        train_lib/eval_lib prepend BlankfieldCorrection."""
        plain, bc = str(tmp_path / "plain"), str(tmp_path / "bc")
        base = [image_file, "--model_path", sel_ckpt, "--selective", "1",
                "--compute_dtype", "float32", "--save_prob", "1",
                "--heatmap", "0"]
        predict_cli.main(base + ["--save_dir", plain])
        predict_cli.main(base + ["--save_dir", bc, "--blankfield", "1"])
        a = np.load(os.path.join(plain, "tile_prob.npy"))
        b = np.load(os.path.join(bc, "tile_prob.npy"))
        assert np.abs(a - b).max() > 0  # the correction altered the input

    def test_colliding_stems_do_not_overwrite(self, sel_ckpt, tmp_path):
        rng = np.random.default_rng(3)
        d1, d2 = tmp_path / "d1", tmp_path / "d2"
        d1.mkdir(), d2.mkdir()
        for d in (d1, d2):  # same basename in two directories
            Image.fromarray((rng.random((32, 32, 3)) * 255).astype(
                np.uint8)).save(str(d / "tile.png"))
        out_dir = str(tmp_path / "out")
        predict_cli.main([
            str(d1 / "tile.png"), str(d2 / "tile.png"),
            "--model_path", sel_ckpt, "--selective", "1",
            "--compute_dtype", "float32", "--save_dir", out_dir,
            "--heatmap", "0",
        ])
        preds = sorted(f for f in os.listdir(out_dir)
                       if f.endswith("_pred.png"))
        assert preds == ["tile_2_pred.png", "tile_pred.png"]

    def test_directory_scan_output_skip_is_case_insensitive(self, tmp_path):
        d = tmp_path / "imgs"
        d.mkdir()
        Image.fromarray(np.zeros((32, 32), np.uint8)).save(
            str(d / "X_PRED.PNG"))  # prior-output decoy, uppercase
        Image.fromarray(np.zeros((32, 32), np.uint8)).save(
            str(d / "y_Label.png"))
        with pytest.raises(FileNotFoundError):
            predict_cli._collect_inputs([str(d)])

    def test_tiled_path_reuses_one_jit_wrapper(self, tmp_path):
        """predict_wsi must not rebuild its jitted forward per image — a
        fresh closure per call recompiles the trunk for every slide
        (~20 s+ each on the tunnel)."""
        from selectivenet_for_semantic_segmentation_binary_tpu.predictor import (
            Predictor,
        )

        ckpt = _make_ckpt(tmp_path, selective=False)
        p = Predictor(ckpt, selective=False, compute_dtype="float32")
        rng = np.random.default_rng(4)
        img = rng.random((64, 64, 3)).astype(np.float32)
        out1 = p.predict_wsi(img, tile=(32, 32))
        fn = p._tiled_apply
        assert fn is not None
        out2 = p.predict_wsi(rng.random((64, 64, 3)).astype(np.float32),
                             tile=(32, 32))
        assert p._tiled_apply is fn  # same wrapper -> same jit cache
        assert out1["prob"].shape == out2["prob"].shape == (64, 64)


class TestWsiCLI:
    @pytest.fixture(scope="class")
    def tree(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("wsi_tree")
        write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=8,
                                   patch_size=32)
        return str(d)

    def test_end_to_end(self, tree, tmp_path, capsys):
        ckpt = _make_ckpt(tmp_path, selective=False)
        out_dir = str(tmp_path / "wsi_out")
        wsi_cli.main([
            "--data_dir", tree, "--test_fold", "1",
            "--model_path", ckpt, "--patch_size", "32", "--nrow", "2",
            "--compute_dtype", "float32", "--batch_size", "4",
            "--num_workers", "2", "--save_dir", out_dir,
        ])
        assert os.path.exists(os.path.join(out_dir, "wsi_performance.csv"))
        heatmaps = [f for f in os.listdir(out_dir) if f.endswith("_heatmap.png")]
        assert heatmaps
        out = capsys.readouterr().out
        assert "nanmean over" in out
        assert "accuracy=" in out

    def test_blankfield_path(self, tree, tmp_path, capsys):
        """--blankfield rides wsi_inference's transform branch (no raw-uint8
        fast path) and still scores end to end."""
        ckpt = _make_ckpt(tmp_path, selective=False)
        wsi_cli.main([
            "--data_dir", tree, "--test_fold", "1",
            "--model_path", ckpt, "--patch_size", "32", "--nrow", "2",
            "--compute_dtype", "float32", "--batch_size", "4",
            "--num_workers", "2", "--blankfield", "1",
        ])
        assert "nanmean over" in capsys.readouterr().out

    def test_h_rgb_input_type(self, tree, tmp_path, capsys):
        """--input_type H_RGB (reference data_utils.py:29-41) rides the
        dataset's stain-conversion path (3-channel trunk) end to end."""
        ckpt = _make_ckpt(tmp_path, selective=False)
        wsi_cli.main([
            "--data_dir", tree, "--test_fold", "1",
            "--model_path", ckpt, "--patch_size", "32", "--nrow", "2",
            "--compute_dtype", "float32", "--batch_size", "4",
            "--num_workers", "2", "--input_type", "H_RGB",
        ])
        assert "nanmean over" in capsys.readouterr().out
