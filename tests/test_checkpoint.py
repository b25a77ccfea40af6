"""Checkpoint tests: layout, digit-sorted resume, torch .pth interchange.

The end-to-end interchange test builds a random reference-named torch
state-dict, computes the reference forward with torch *functional* ops (the
oracle), imports the state-dict through utils/checkpoint.py, and requires the
JAX model to reproduce the output — this pins conv/convT layout mappings, BN
stats, skip ordering and head naming all at once.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import UNetB
from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
    AsyncCheckpointWriter,
    latest_checkpoint,
    list_checkpoints,
    load_checkpoint,
    remove_module_prefix,
    save_checkpoint,
    torch_state_dict_to_variables,
)


class TestNativeCheckpoint:
    def test_save_load_roundtrip(self, tmp_path, rng):
        state = {
            "net": {"params": {"w": rng.standard_normal((3, 3)).astype(np.float32)}},
            "epoch": 7,
        }
        path = save_checkpoint(str(tmp_path), state, 7)
        assert path.endswith("model_epoch7.ckpt")
        loaded = load_checkpoint(path)
        np.testing.assert_array_equal(loaded["net"]["params"]["w"], state["net"]["params"]["w"])
        assert loaded["epoch"] == 7

    def test_latest_by_digits(self, tmp_path):
        for e in [1, 2, 10, 9]:  # lexicographic would pick 9; digit sort must pick 10
            save_checkpoint(str(tmp_path), {"epoch": e}, e)
        path, epoch = latest_checkpoint(str(tmp_path))
        assert epoch == 10
        assert path.endswith("model_epoch10.ckpt")

    def test_latest_none_when_missing(self, tmp_path):
        assert latest_checkpoint(str(tmp_path / "nope")) is None

    def test_list_checkpoints(self, tmp_path):
        for e in [2, 1]:
            save_checkpoint(str(tmp_path), {"epoch": e}, e)
        paths = list_checkpoints(str(tmp_path))
        assert len(paths) == 2
        assert all(p.endswith(".ckpt") for p in paths)

    def test_prune_keeps_newest_by_digits(self, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            prune_checkpoints,
        )

        for e in [1, 2, 9, 10, 11]:  # digit order, not lexicographic
            save_checkpoint(str(tmp_path), {"epoch": e}, e)
        # A reference .pth import artifact must survive pruning.
        (tmp_path / "model_epoch0.pth").write_bytes(b"torch")
        prune_checkpoints(str(tmp_path), keep=2)
        left = sorted(os.listdir(tmp_path))
        assert left == ["model_epoch0.pth", "model_epoch10.ckpt", "model_epoch11.ckpt"]

    def test_prune_zero_keeps_everything(self, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            prune_checkpoints,
        )

        for e in [1, 2, 3]:
            save_checkpoint(str(tmp_path), {"epoch": e}, e)
        prune_checkpoints(str(tmp_path), keep=0)
        prune_checkpoints(str(tmp_path / "missing-dir"), keep=3)  # no-op, no raise
        assert len(list_checkpoints(str(tmp_path))) == 3


def _random_torch_state_dict(rng, input_ch=3, selective=True, prefix=""):
    """Reference-named random state dict (names from reference model.py)."""
    cbr_specs = {
        "encoder_layer_1_1": (input_ch, 64), "encoder_layer_1_2": (64, 64),
        "encoder_layer_2_1": (64, 128), "encoder_layer_2_2": (128, 128),
        "encoder_layer_3_1": (128, 256), "encoder_layer_3_2": (256, 256),
        "decoder_layer_4_2": (256, 512), "decoder_layer_4_1": (512, 512),
        "decoder_layer_3_2": (512, 256), "decoder_layer_3_1": (256, 256),
        "decoder_layer_2_2": (256, 128), "decoder_layer_2_1": (128, 128),
        "decoder_layer_1_2": (128, 64), "decoder_layer_1_1": (64, 64),
    }
    up_specs = {"unpool3": (512, 256), "unpool2": (256, 128), "unpool1": (128, 64)}
    head_specs = {"conv1x1": (64, 1)}
    if selective:
        head_specs.update({"conv_select": (64, 1), "conv_aux": (64, 1)})

    sd = {}
    f32 = lambda *s: (0.2 * rng.standard_normal(s)).astype(np.float32)
    for name, (i, o) in cbr_specs.items():
        # fan-in scaling keeps 20-layer activations O(1) so the fp32
        # comparison tolerance is meaningful
        sd[f"{prefix}{name}.0.weight"] = (
            rng.standard_normal((o, i, 3, 3)) / np.sqrt(9 * i)
        ).astype(np.float32)
        sd[f"{prefix}{name}.0.bias"] = f32(o)
        sd[f"{prefix}{name}.1.weight"] = 1.0 + 0.1 * f32(o)
        sd[f"{prefix}{name}.1.bias"] = f32(o)
        sd[f"{prefix}{name}.1.running_mean"] = f32(o)
        sd[f"{prefix}{name}.1.running_var"] = (1.0 + 0.1 * f32(o)) ** 2
    for name, (i, o) in up_specs.items():
        sd[f"{prefix}{name}.weight"] = f32(i, o, 2, 2)
        sd[f"{prefix}{name}.bias"] = f32(o)
    for name, (i, o) in head_specs.items():
        sd[f"{prefix}{name}.weight"] = f32(o, i, 1, 1)
        sd[f"{prefix}{name}.bias"] = f32(o)
    return sd


def _torch_reference_forward(sd, x_nchw, selective=True):
    """Reference UNet_B forward computed with torch functional ops only."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    def cbr(x, name):
        x = F.conv2d(x, t[f"{name}.0.weight"], t[f"{name}.0.bias"], padding=1)
        x = F.batch_norm(
            x, t[f"{name}.1.running_mean"], t[f"{name}.1.running_var"],
            t[f"{name}.1.weight"], t[f"{name}.1.bias"], training=False, eps=1e-5,
        )
        return F.relu(x)

    def up(x, name):
        return F.conv_transpose2d(x, t[f"{name}.weight"], t[f"{name}.bias"], stride=2)

    x = torch.from_numpy(x_nchw)
    e1 = cbr(cbr(x, "encoder_layer_1_1"), "encoder_layer_1_2")
    e2 = cbr(cbr(F.max_pool2d(e1, 2), "encoder_layer_2_1"), "encoder_layer_2_2")
    e3 = cbr(cbr(F.max_pool2d(e2, 2), "encoder_layer_3_1"), "encoder_layer_3_2")
    b = cbr(cbr(F.max_pool2d(e3, 2), "decoder_layer_4_2"), "decoder_layer_4_1")
    d3 = cbr(cbr(torch.cat([up(b, "unpool3"), e3], 1), "decoder_layer_3_2"), "decoder_layer_3_1")
    d2 = cbr(cbr(torch.cat([up(d3, "unpool2"), e2], 1), "decoder_layer_2_2"), "decoder_layer_2_1")
    d1 = cbr(cbr(torch.cat([up(d2, "unpool1"), e1], 1), "decoder_layer_1_2"), "decoder_layer_1_1")

    def head(name):
        return F.conv2d(d1, t[f"{name}.weight"], t[f"{name}.bias"]).squeeze(1).numpy()

    if selective:
        return head("conv1x1"), head("conv_select"), head("conv_aux")
    return head("conv1x1")


class TestTorchInterchange:
    def test_remove_module_prefix(self, rng):
        sd = {"module.conv1x1.weight": 1, "module.conv1x1.bias": 2}
        out = remove_module_prefix(sd)
        assert set(out) == {"conv1x1.weight", "conv1x1.bias"}

    def test_forward_parity_selective(self, rng):
        sd = _random_torch_state_dict(rng, selective=True)
        variables = torch_state_dict_to_variables(sd)
        model = UNetB(selective=True)
        x = (0.5 * rng.standard_normal((1, 32, 32, 3))).astype(np.float32)
        out, sel, aux = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        t_out, t_sel, t_aux = _torch_reference_forward(sd, x.transpose(0, 3, 1, 2), True)
        np.testing.assert_allclose(np.asarray(out), t_out, rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(sel), t_sel, rtol=1e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(aux), t_aux, rtol=1e-3, atol=2e-3)

    def test_forward_parity_dataparallel_prefix(self, rng):
        """Checkpoints saved under DataParallel carry 'module.' prefixes
        (net_utils.py:11-16); import must tolerate them."""
        sd = _random_torch_state_dict(rng, selective=False, prefix="module.")
        variables = torch_state_dict_to_variables(sd)
        model = UNetB(selective=False)
        x = (0.5 * rng.standard_normal((1, 32, 32, 3))).astype(np.float32)
        out = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=False,
        )
        bare = {k.replace("module.", ""): v for k, v in sd.items()}
        t_out = _torch_reference_forward(bare, x.transpose(0, 3, 1, 2), False)
        np.testing.assert_allclose(np.asarray(out), t_out, rtol=1e-3, atol=2e-3)

    def test_structure_matches_model_init(self, rng):
        """Imported pytree must exactly match the model's own variable tree."""
        sd = _random_torch_state_dict(rng, selective=True)
        variables = torch_state_dict_to_variables(sd)
        model = UNetB(selective=True)
        ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)

        def paths(tree):
            return {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(variables["params"]) == paths(ref["params"])
        assert paths(variables["batch_stats"]) == paths(ref["batch_stats"])


class TestAsyncWriter:
    def test_writes_match_sync_format(self, tmp_path, rng):
        w = AsyncCheckpointWriter()
        for epoch in (1, 2, 3):
            state = {"net": {"params": {"w": np.full((4, 4), float(epoch), np.float32)}},
                     "epoch": epoch}
            w.save(str(tmp_path), state, epoch)
        w.wait()
        found = latest_checkpoint(str(tmp_path))
        assert found is not None and found[1] == 3
        loaded = load_checkpoint(found[0])
        assert loaded["epoch"] == 3
        np.testing.assert_array_equal(loaded["net"]["params"]["w"], 3.0)
        assert len(list_checkpoints(str(tmp_path))) == 3

    def test_write_error_surfaces_on_wait(self, tmp_path):
        w = AsyncCheckpointWriter()
        # a directory path that is actually a file -> makedirs/open fails
        blocker = tmp_path / "ckpt"
        blocker.write_text("not a directory")
        w.save(str(blocker), {"epoch": 1}, 1)
        with pytest.raises(Exception):
            w.wait()
        # the writer is reusable after the error is consumed
        w.save(str(tmp_path), {"epoch": 2}, 2)
        w.wait()
        assert latest_checkpoint(str(tmp_path))[1] == 2


class TestCorruptCheckpointResilience:
    def test_falls_back_to_previous_loadable(self, tmp_path):
        save_checkpoint(str(tmp_path), {"epoch": 1}, 1)
        save_checkpoint(str(tmp_path), {"epoch": 2}, 2)
        # corrupt the newest file (truncated write without atomic rename)
        with open(tmp_path / "model_epoch3.ckpt", "wb") as f:
            f.write(b"\x82garbage-truncated")
        path, epoch = latest_checkpoint(str(tmp_path))
        assert epoch == 2
        assert load_checkpoint(path)["epoch"] == 2

    def test_all_corrupt_returns_none(self, tmp_path):
        with open(tmp_path / "model_epoch1.ckpt", "wb") as f:
            f.write(b"junk")
        assert latest_checkpoint(str(tmp_path)) is None

    def test_load_latest_parses_once_with_same_fallback(self, tmp_path):
        """load_latest_checkpoint returns the parsed payload directly (the
        resume path previously full-parsed every candidate in _loadable and
        then loaded the winner AGAIN) and keeps the corrupt-newest fallback."""
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            load_latest_checkpoint,
        )

        save_checkpoint(str(tmp_path), {"epoch": 1}, 1)
        save_checkpoint(str(tmp_path), {"epoch": 2}, 2)
        with open(tmp_path / "model_epoch3.ckpt", "wb") as f:
            f.write(b"\x82garbage-truncated")
        path, epoch, payload = load_latest_checkpoint(str(tmp_path))
        assert epoch == 2 and path.endswith("model_epoch2.ckpt")
        assert payload["epoch"] == 2

        with open(tmp_path / "model_epoch2.ckpt", "wb") as f:
            f.write(b"junk")
        with open(tmp_path / "model_epoch1.ckpt", "wb") as f:
            f.write(b"junk")
        assert load_latest_checkpoint(str(tmp_path)) is None

    def test_latest_verify_false_skips_loadability(self, tmp_path):
        """verify=False picks the digit-latest NAME without parsing (the
        sweep's remaining-epochs probe only needs the number; corruption then
        surfaces at load time instead)."""
        save_checkpoint(str(tmp_path), {"epoch": 1}, 1)
        with open(tmp_path / "model_epoch3.ckpt", "wb") as f:
            f.write(b"junk")
        assert latest_checkpoint(str(tmp_path))[1] == 1
        assert latest_checkpoint(str(tmp_path), verify=False)[1] == 3


class TestTorchExport:
    def test_roundtrip_identity(self, rng):
        """export -> import must reproduce the exact variable pytree."""
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            torch_state_dict_to_variables,
            variables_to_torch_state_dict,
        )

        sd = _random_torch_state_dict(rng, selective=True)
        variables = torch_state_dict_to_variables(sd)
        sd_back = variables_to_torch_state_dict(variables)
        assert set(sd_back) == set(sd)
        for k in sd:
            np.testing.assert_allclose(sd_back[k], sd[k], rtol=1e-6, atol=1e-7)

    def test_export_pth_loads_via_eval_path(self, tmp_path, rng):
        """A .pth written by export_torch_checkpoint must load through the
        same import path eval.py uses, with identical forwards."""
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            export_torch_checkpoint,
            load_net_checkpoint,
        )

        model = UNetB(selective=True)
        variables = jax.device_get(
            model.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)), train=False)
        )
        path = str(tmp_path / "model_epoch5.pth")
        export_torch_checkpoint(variables, path)
        loaded = load_net_checkpoint(path)

        x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
        ref = model.apply(variables, x, train=False)
        got = model.apply(
            {"params": loaded["params"], "batch_stats": loaded["batch_stats"]},
            x, train=False,
        )
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5, atol=1e-6)


class TestAsyncPrune:
    def test_async_writer_applies_retention(self, tmp_path):
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            prune_checkpoints,
        )

        w = AsyncCheckpointWriter()
        for e in [1, 2, 3, 4]:
            w.save(str(tmp_path), {"epoch": e}, e, keep=2)
        w.wait()
        left = sorted(f for f in os.listdir(tmp_path) if f.endswith(".ckpt"))
        assert left == ["model_epoch3.ckpt", "model_epoch4.ckpt"]
        # sanity: a later sync prune with keep=1 leaves only the newest
        prune_checkpoints(str(tmp_path), keep=1)
        assert sorted(os.listdir(tmp_path)) == ["model_epoch4.ckpt"]


class TestPthResumePayload:
    def test_pth_resume_parses_once_and_returns_net(self, tmp_path):
        """A reference .pth as the newest file resumes through the same
        single-parse path: load_latest_checkpoint imports it in place
        (payload {'net': {params, batch_stats}}), instead of torch.load-ing
        it once to 'verify' and again to use."""
        from selectivenet_for_semantic_segmentation_binary_tpu.models import UNetB
        from selectivenet_for_semantic_segmentation_binary_tpu.utils.checkpoint import (
            export_torch_checkpoint,
            load_latest_checkpoint,
        )

        model = UNetB(selective=False)
        variables = jax.device_get(
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False))
        export_torch_checkpoint(variables, str(tmp_path / "model_epoch7.pth"))
        path, epoch, payload = load_latest_checkpoint(str(tmp_path))
        assert epoch == 7 and path.endswith("model_epoch7.pth")
        assert set(payload["net"]) >= {"params", "batch_stats"}
