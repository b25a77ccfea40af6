"""Tool tests: data splitting, WSI stitching/heatmaps, MC uncertainty."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.data import (
    PatchDataset,
    construct_test,
    construct_train_valid,
    write_synthetic_patch_tree,
)
from selectivenet_for_semantic_segmentation_binary_tpu.models import UNetB
from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
    build_fold_lists,
    make_heatmap,
    mc_uncertainty,
    mine_non_tissue,
    save_performance_as_csv,
    stitch_patches,
    tumor_pixel_report,
    tumor_proportion_histogram,
    wsi_inference,
)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    """A patch tree WITHOUT fold npys (build_fold_lists must create them)."""
    d = tmp_path_factory.mktemp("raw")
    write_synthetic_patch_tree(str(d), n_slides=2, patches_per_slide=10, patch_size=32)
    for f in os.listdir(str(d)):
        if f.endswith(".npy"):
            os.remove(os.path.join(str(d), f))
    return str(d)


class TestDataSplit:
    def test_build_fold_lists_end_to_end(self, raw_tree):
        counts = build_fold_lists(raw_tree, patch_mag=200, patch_size=32)
        assert counts["tumorable"] + counts["non_tumorable"] == 20
        # the generated npys must feed the fold constructors directly
        train, valid = construct_train_valid(raw_tree, test_fold=5)
        test = construct_test(raw_tree, test_fold=5)
        assert len(train) + len(valid) + len(test) == 20

    def test_folds_partition_disjointly(self, raw_tree):
        all_pairs = set()
        for fold in range(1, 6):
            for cls in ("tumorable", "non_tumorable"):
                arr = np.load(f"{raw_tree}/{fold}-fold_{cls}_data.npy")
                pairs = {tuple(r) for r in arr}
                assert all_pairs.isdisjoint(pairs)
                all_pairs |= pairs
        assert len(all_pairs) == 20

    def test_threshold_semantics(self, tmp_path):
        """A patch is tumorable iff sum(label) > 10% of 255*size^2."""
        from PIL import Image

        d = tmp_path / "thr"
        pd = d / "200x_32"
        pd.mkdir(parents=True)
        # patch A: 5% tumor (below threshold); patch B: 50% (above)
        for stem, frac in (("s_0_0", 0.05), ("s_1_0", 0.5)):
            lab = np.zeros((32, 32), np.uint8)
            lab.flat[: int(frac * 32 * 32)] = 255
            Image.fromarray(np.full((32, 32, 3), 200, np.uint8)).save(pd / f"{stem}_input.jpg")
            Image.fromarray(lab).save(pd / f"{stem}_label.png")
        counts = build_fold_lists(str(d), patch_size=32)
        assert counts == {"tumorable": 1, "non_tumorable": 1}

    def test_mine_non_tissue(self, tmp_path):
        from PIL import Image

        d = tmp_path / "mine"
        pd = d / "200x_32"
        pd.mkdir(parents=True)
        white = np.full((32, 32, 3), 250, np.uint8)
        dark = np.full((32, 32, 3), 100, np.uint8)
        for stem, img in (("w_0_0", white), ("d_0_0", dark)):
            Image.fromarray(img).save(pd / f"{stem}_input.jpg")
            Image.fromarray(np.zeros((32, 32), np.uint8)).save(pd / f"{stem}_label.png")
        out = tmp_path / "mined"
        n = mine_non_tissue(str(d), str(out), patch_size=32)
        assert n == 1
        assert (out / "w_0_0_input.jpg").exists()
        assert (out / "w_0_0_label.png").exists()

    def test_tumor_pixel_report(self, raw_tree):
        report = tumor_pixel_report(raw_tree, patch_size=32)
        assert set(report) == {1, 2, 3, 4, 5}
        for fold, stats in report.items():
            assert 0.0 <= stats["tumor_ratio"] <= 1.0

    def test_tumor_proportion_histogram(self, raw_tree):
        """Notebook cells 5-8 semantics: per-patch proportion rounded to 3
        digits, decile counts sum to the patch count, absent sizes skipped."""
        report = tumor_proportion_histogram(raw_tree, patch_mag=200,
                                            patch_sizes=(32, 512))
        assert set(report) == {32}  # no 200x_512 tree in the fixture
        stats = report[32]
        assert stats["n_patches"] == 20
        assert sum(stats["decile_counts"]) == stats["n_patches"]
        assert all(0.0 <= p <= 1.0 for p in stats["proportions"])
        # spot-check one patch against the formula (cell 5)
        from PIL import Image
        patch_dir = os.path.join(raw_tree, "200x_32")
        lab = sorted(f for f in os.listdir(patch_dir) if f.endswith("_label.png"))[0]
        label = np.asarray(Image.open(os.path.join(patch_dir, lab)).convert("L"),
                           np.int64)
        expected = round(float(label.sum()) / (255.0 * 32 * 32), 3)
        assert expected in stats["proportions"]


class TestWSI:
    def test_stitch_placement_convention(self):
        """patch j -> row j % nrow, col j // nrow (u-net_testing.ipynb cell 7)."""
        patches = np.arange(6, dtype=np.float32).reshape(6, 1, 1) * np.ones((6, 2, 2), np.float32)
        canvas = stitch_patches(patches, nrow=3)
        assert canvas.shape == (6, 4)
        assert canvas[0, 0] == 0  # j=0 -> (0,0)
        assert canvas[2, 0] == 1  # j=1 -> (1,0)
        assert canvas[4, 0] == 2  # j=2 -> (2,0)
        assert canvas[0, 2] == 3  # j=3 -> (0,1)

    def test_heatmap_shape_and_range(self):
        hm = make_heatmap(np.linspace(0, 1, 16).reshape(4, 4))
        assert hm.shape == (4, 4, 3)
        assert hm.dtype == np.float32
        assert hm.min() >= 0.0 and hm.max() <= 1.0

    def test_csv_export(self, tmp_path):
        path = save_performance_as_csv(str(tmp_path), [[0.9, 0.8, 0.7, 0.75, 0.95]], "perf")
        import csv

        with open(path) as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["accuracy", "recall", "precision", "f1 score", "AUC score"]
        assert rows[1][0] == "0.9"

    def test_wsi_inference_end_to_end(self, raw_tree, tmp_path):
        test = construct_test(raw_tree, test_fold=1)
        ds = PatchDataset(raw_tree, test, patch_mag=200, patch_size=32)
        model = UNetB(selective=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        results = wsi_inference(
            model, variables, ds, nrow=2, batch_size=4, save_dir=str(tmp_path / "out")
        )
        assert results
        for slide, entry in results.items():
            assert entry["prob"].shape[0] % 32 == 0
            assert entry["heatmap"].shape[-1] == 3
            assert entry["patch_scores"].shape[1] == 5
            assert (tmp_path / "out" / f"{slide}_heatmap.png").exists()
        assert (tmp_path / "out" / "wsi_performance.csv").exists()

    def test_arbitrary_size_tile(self):
        """cells 64-74: single large-tile forward through the FCN."""
        model = UNetB(selective=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
        big = jnp.zeros((1, 64, 96, 3))
        out = model.apply(variables, big, train=False)
        assert out.shape == (1, 64, 96)


class TestMCUncertainty:
    def test_aggregation_math_matches_notebook(self, rng):
        """check_MC_dropout.ipynb cells 0-4: variance across repeats, mean over
        classes, negated — verified against a direct numpy computation."""
        probs = rng.random((10, 2, 4, 4, 3)).astype(np.float32)  # (T,N,H,W,C)
        expected_conf = -np.mean(np.var(probs, axis=0), axis=-1)
        got = -np.mean(np.asarray(jnp.var(jnp.asarray(probs), axis=0)), axis=-1)
        np.testing.assert_allclose(got, expected_conf, rtol=1e-4, atol=1e-6)

    def test_mc_uncertainty_with_dropout(self, rng):
        model = UNetB(selective=False, dropout_rate=0.3)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        out = mc_uncertainty(model, variables, x, n_iter=8, rng=jax.random.PRNGKey(1))
        assert out["mean_prob"].shape == (1, 16, 16, 1)
        assert out["confidence"].shape == (1, 16, 16)
        # dropout active -> repeats differ -> strictly negative confidence somewhere
        assert float(jnp.min(out["confidence"])) < 0.0

    def test_repeated_calls_reuse_one_compile(self, rng):
        """Per-batch MC uncertainty must not retrace: the old per-call
        closure recompiled the n_iter-forward program for every batch (a
        24-1128 s remote compile each on the tunnel)."""
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.uncertainty import (
            _mc_run,
        )

        model = UNetB(selective=False, dropout_rate=0.3)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)), train=False)
        before = _mc_run._cache_size()
        for seed in (1, 2, 3):
            x = jnp.asarray(
                rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
            mc_uncertainty(model, variables, x, n_iter=4,
                           rng=jax.random.PRNGKey(seed))
        assert _mc_run._cache_size() == before + 1

    def test_no_dropout_zero_variance(self, rng):
        model = UNetB(selective=False, dropout_rate=0.0)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        out = mc_uncertainty(model, variables, x, n_iter=4, rng=jax.random.PRNGKey(1))
        np.testing.assert_allclose(np.asarray(out["variance"]), 0.0, atol=1e-7)


class TestInspectCkpt:
    """tools/inspect_ckpt.py — check_net.ipynb parity (key sets, module. prefix,
    DP/native interchange comparison)."""

    @pytest.fixture(scope="class")
    def ckpt_pair(self, tmp_path_factory):
        """A native .ckpt and its exported .pth (with module. prefix) of the
        same selective UNet_B init."""
        import torch

        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            save_checkpoint,
            variables_to_torch_state_dict,
        )

        d = tmp_path_factory.mktemp("inspect")
        model = UNetB(selective=True)
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)
        native = save_checkpoint(str(d), {"net": variables, "epoch": 3}, 3)
        sd = {
            "module." + k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in variables_to_torch_state_dict(variables).items()
        }
        pth = os.path.join(str(d), "model_epoch3.pth")
        torch.save({"net": sd, "optim": {}}, pth)
        return native, pth

    def test_summarize_native(self, ckpt_pair):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
            summarize_checkpoint,
        )

        info = summarize_checkpoint(ckpt_pair[0])
        assert info["format"] == "native"
        assert info["epoch_stored"] == 3
        assert info["selective"] is True
        assert info["dataparallel_prefix"] is False
        assert info["n_params"] > 7_000_000  # the 7.70M-param UNet_B

    def test_summarize_torch_detects_dp_prefix(self, ckpt_pair):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
            summarize_checkpoint,
        )

        info = summarize_checkpoint(ckpt_pair[1])
        assert info["format"] == "torch"
        assert info["dataparallel_prefix"] is True
        assert info["selective"] is True
        assert "net" in info["payload_keys"] and "optim" in info["payload_keys"]

    def test_compare_native_vs_dp_torch_matches(self, ckpt_pair):
        """The notebook's DP-vs-bare interchange check: identical key sets and
        shapes once both formats are canonicalised (net_utils.py:11-16)."""
        from selectivenet_for_semantic_segmentation_binary_tpu.tools import (
            compare_checkpoints,
        )

        d = compare_checkpoints(ckpt_pair[0], ckpt_pair[1])
        assert d["only_in_a"] == [] and d["only_in_b"] == []
        assert d["shape_mismatch"] == {}
        # 14 CBR x 6 tensors + 3 upconv x 2 + 3 heads x 2 = 96
        assert d["n_shared"] == 96

    def test_cli_runs(self, ckpt_pair, capsys):
        from selectivenet_for_semantic_segmentation_binary_tpu.tools.inspect_ckpt import (
            main,
        )

        main([ckpt_pair[0], "--compare", ckpt_pair[1]])
        out = capsys.readouterr().out
        assert "MATCH: identical key sets and shapes" in out


def test_wsi_inference_normalized_dataset_not_double_normalized(raw_tree, rng):
    """A dataset whose transform chain already applied Normalization must be
    fed to the net AS-IS (re-normalizing maps [-1,1] to [-3,1] and garbles
    every canvas); probabilities must match the raw-mode run bit-for-bit
    modulo dtype, and the display canvas must be back in [0,1]."""
    from selectivenet_for_semantic_segmentation_binary_tpu.data import (
        Compose,
        Normalization,
        ToArray,
        construct_test,
    )

    test = construct_test(raw_tree, test_fold=1)
    ds_raw = PatchDataset(raw_tree, test, patch_mag=200, patch_size=32)
    ds_norm = PatchDataset(
        raw_tree, test, patch_mag=200, patch_size=32,
        transform=Compose([Normalization(0.5, 0.5), ToArray()]),
    )
    model = UNetB(selective=False)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                           train=False)

    res_raw = wsi_inference(model, variables, ds_raw, nrow=2, batch_size=4)
    res_norm = wsi_inference(model, variables, ds_norm, nrow=2, batch_size=4)

    assert set(res_raw) == set(res_norm)
    for slide in res_raw:
        np.testing.assert_allclose(res_norm[slide]["prob"],
                                   res_raw[slide]["prob"], atol=1e-5)
        sample = res_norm[slide]["sample"]
        assert sample.min() >= 0.0 and sample.max() <= 1.0
        np.testing.assert_allclose(sample, res_raw[slide]["sample"], atol=1e-6)
