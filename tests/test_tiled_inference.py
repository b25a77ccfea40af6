"""Tiled whole-slide inference must equal the monolithic forward pixel-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import UNetB
from selectivenet_for_semantic_segmentation_binary_tpu.tools.tiled_inference import (
    DEFAULT_HALO,
    tiled_inference,
    wsi_mask,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = UNetB(selective=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def _apply(model, variables):
    def fn(batch):
        return model.apply(variables, batch, train=False)

    return fn


class TestTiledInference:
    def test_exact_equality_with_monolithic(self, model_and_vars, rng):
        model, variables = model_and_vars
        img = jnp.asarray(rng.standard_normal((192, 256, 3)).astype(np.float32))
        full = model.apply(variables, img[None], train=False)
        tiled = tiled_inference(_apply(model, variables), img, tile=(64, 64))
        for f, t in zip(full, tiled):
            np.testing.assert_allclose(np.asarray(f[0]), t, rtol=1e-5, atol=1e-5)

    def test_non_divisible_tile_remainders(self, model_and_vars, rng):
        """Image not a multiple of the tile -> remainder chunks still exact."""
        model, variables = model_and_vars
        img = jnp.asarray(rng.standard_normal((200, 168, 3)).astype(np.float32))
        full = model.apply(variables, img[None], train=False)
        tiled = tiled_inference(_apply(model, variables), img, tile=(144, 144))
        np.testing.assert_allclose(np.asarray(full[0][0]), tiled[0], rtol=1e-5, atol=1e-5)

    def test_single_window_small_image(self, model_and_vars, rng):
        model, variables = model_and_vars
        img = jnp.asarray(rng.standard_normal((64, 64, 3)).astype(np.float32))
        full = model.apply(variables, img[None], train=False)
        tiled = tiled_inference(_apply(model, variables), img, tile=(512, 512))
        np.testing.assert_allclose(np.asarray(full[0][0]), tiled[0], rtol=1e-5, atol=1e-5)

    def test_rejects_bad_halo_and_dims(self, model_and_vars, rng):
        model, variables = model_and_vars
        img = jnp.zeros((64, 64, 3))
        with pytest.raises(ValueError, match="halo"):
            tiled_inference(_apply(model, variables), img, halo=16)
        with pytest.raises(ValueError, match="divisible"):
            tiled_inference(_apply(model, variables), jnp.zeros((65, 64, 3)))

    def test_wsi_mask_outputs(self, model_and_vars, rng):
        model, variables = model_and_vars
        img = rng.random((128, 128, 3)).astype(np.float32)
        out = wsi_mask(model, variables, img, selective=True, tile=(64, 64))
        assert out["prob"].shape == (128, 128)
        assert set(np.unique(out["pred"])) <= {0, 1}
        assert out["selection"].shape == (128, 128)

    def test_plain_model_single_output(self, rng):
        model = UNetB(selective=False)
        variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False)
        img = jnp.asarray(rng.standard_normal((128, 64, 3)).astype(np.float32))
        full = model.apply(variables, img[None], train=False)

        def fn(batch):
            return model.apply(variables, batch, train=False)

        tiled = tiled_inference(fn, img, tile=(64, 64))
        np.testing.assert_allclose(np.asarray(full[0]), tiled, rtol=1e-5, atol=1e-5)


class TestMeshTiled:
    """mesh= shards window batches across chips; results stay pixel-exact."""

    def test_exact_equality_on_mesh(self, model_and_vars, rng):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )

        model, variables = model_and_vars
        mesh = make_mesh(8)
        img = jnp.asarray(rng.standard_normal((192, 256, 3)).astype(np.float32))
        # 12 windows of 64x64: a full batch of 8 plus a ragged tail of 4
        single = tiled_inference(_apply(model, variables), img, tile=(64, 64),
                                 batch_size=8)
        meshed = tiled_inference(_apply(model, variables), img, tile=(64, 64),
                                 batch_size=8, mesh=mesh)
        for s, m in zip(single, meshed):
            np.testing.assert_allclose(m, s, rtol=1e-5, atol=1e-5)

    def test_batch_size_rounded_up_to_mesh(self, model_and_vars, rng):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )

        model, variables = model_and_vars
        mesh = make_mesh(8)
        img = jnp.asarray(rng.standard_normal((128, 128, 3)).astype(np.float32))
        # batch_size 3 is not divisible by the mesh; must still be exact
        full = model.apply(variables, img[None], train=False)
        got = tiled_inference(_apply(model, variables), img, tile=(64, 64),
                              batch_size=3, mesh=mesh)
        for f, g in zip(full, got):
            np.testing.assert_allclose(g, np.asarray(f[0]), rtol=1e-5, atol=1e-5)

    def test_wsi_mask_accepts_mesh(self, model_and_vars, rng):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )

        model, variables = model_and_vars
        img = rng.random((128, 128, 3)).astype(np.float32)
        res = wsi_mask(model, variables, img, selective=True,
                       tile=(64, 64), mesh=make_mesh(4))
        assert res["pred"].shape == (128, 128)
        assert set(np.unique(res["pred"])) <= {0, 1}
        assert "selection" in res


class TestCEHeads:
    """The CE-form UNet emits (N, h, w, K) maps; tiling must preserve the
    channel dim and wsi_mask must threshold the softmax class-1 plane."""

    def test_tiled_inference_preserves_channel_dim(self, rng):
        from selectivenet_for_semantic_segmentation_binary_tpu.models import UNet

        model = UNet(n_cls=3, selective=False)
        variables = model.init(jax.random.PRNGKey(2),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        img = jnp.asarray(rng.standard_normal((128, 128, 3)), jnp.float32)
        full = np.asarray(model.apply(variables, img[None], train=False))[0]
        tiled = tiled_inference(_apply(model, variables), img,
                                tile=(64, 64), halo=DEFAULT_HALO)
        assert tiled.shape == (128, 128, 3)
        # windows run as a batch of 4 vs the monolithic batch of 1; with a
        # K-channel head XLA picks (very slightly) different fusions per
        # batch shape — ulp-level only
        np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=1e-7)

    def test_wsi_mask_ce_selective(self, rng):
        from selectivenet_for_semantic_segmentation_binary_tpu.models import UNet

        model = UNet(n_cls=2, selective=True)
        variables = model.init(jax.random.PRNGKey(3),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        img = rng.random((128, 128, 3)).astype(np.float32)
        out = wsi_mask(model, variables, img, selective=True, tile=(64, 64))
        assert out["prob"].shape == (128, 128)
        assert out["pred"].dtype == np.uint8
        assert out["selection"].shape == (128, 128)
        assert np.all((out["prob"] >= 0) & (out["prob"] <= 1))
        # softmax class-1 plane, not sigmoid of a 3-D map
        x = (img - 0.5) / 0.5
        logits = np.asarray(model.apply(variables, jnp.asarray(x)[None],
                                        train=False)[0])[0]
        e = np.exp(logits - logits.max(-1, keepdims=True))
        np.testing.assert_allclose(out["prob"], (e / e.sum(-1, keepdims=True))[..., 1],
                                   rtol=1e-5, atol=1e-6)
