"""Spatially-partitioned inference must equal the monolithic forward exactly
on the virtual 8-device CPU mesh (halo-exchange + pooling alignment proof)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import UNetB, build_model
from selectivenet_for_semantic_segmentation_binary_tpu.ops.fold_bn import fold_batchnorm
from selectivenet_for_semantic_segmentation_binary_tpu.parallel import make_mesh
from selectivenet_for_semantic_segmentation_binary_tpu.parallel.spatial import (
    spatial_forward,
)


@pytest.fixture(scope="module")
def selective_model():
    model = UNetB(selective=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    # perturb BN stats so the BN path is non-trivial
    variables = jax.device_get(variables)

    def perturb(tree, key=[0]):
        for k, v in tree.items():
            if k == "bn":
                rng = np.random.default_rng(key[0]); key[0] += 1
                v["mean"] = 0.2 * rng.standard_normal(v["mean"].shape).astype(np.float32)
                v["var"] = (1.0 + 0.2 * rng.random(v["var"].shape)).astype(np.float32)
            elif isinstance(v, dict):
                perturb(v)

    perturb(variables["batch_stats"])
    return model, variables


class TestSpatialForward:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_exact_vs_monolithic(self, selective_model, rng, n_dev):
        model, variables = selective_model
        mesh = make_mesh(n_dev)
        x = jnp.asarray(rng.standard_normal((2, 8 * 8 * n_dev, 64, 3)).astype(np.float32))
        ref = model.apply(variables, x, train=False)
        got = spatial_forward(variables, x, mesh, selective=True)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4)

    def test_plain_head(self, rng):
        model = UNetB(selective=False)
        variables = jax.device_get(
            model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)), train=False)
        )
        mesh = make_mesh(4)
        x = jnp.asarray(rng.standard_normal((1, 256, 64, 3)).astype(np.float32))
        ref = model.apply(variables, x, train=False)
        got = spatial_forward(variables, x, mesh, selective=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_folded_params_supported(self, selective_model, rng):
        model, variables = selective_model
        folded = fold_batchnorm(variables)
        folded_model = build_model("UNet_B", selective=True, folded=True)
        mesh = make_mesh(4)
        x = jnp.asarray(rng.standard_normal((1, 256, 64, 3)).astype(np.float32))
        ref = folded_model.apply({"params": folded["params"]}, x, train=False)
        got = spatial_forward({"params": folded["params"]}, x, mesh, selective=True)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4)

    def test_rejects_misaligned_height(self, selective_model):
        _, variables = selective_model
        mesh = make_mesh(8)
        with pytest.raises(ValueError, match="divisible"):
            spatial_forward(variables, jnp.zeros((1, 72, 64, 3)), mesh)

    def test_output_is_sharded(self, selective_model, rng):
        _, variables = selective_model
        mesh = make_mesh(8)
        x = jnp.asarray(rng.standard_normal((1, 512, 64, 3)).astype(np.float32))
        out, _, _ = spatial_forward(variables, x, mesh, selective=True)
        assert len(out.sharding.device_set) == 8


class TestSpatialForward2D:
    """2-D (batch x rows) mesh: DP x SP combined inference regime."""

    @pytest.mark.parametrize("dp,sp", [(2, 4), (4, 2), (2, 2)])
    def test_exact_vs_monolithic(self, selective_model, rng, dp, sp):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.spatial import (
            make_mesh_2d,
            spatial_forward_2d,
        )

        model, variables = selective_model
        mesh = make_mesh_2d(dp, sp)
        x = jnp.asarray(
            rng.standard_normal((2 * dp, 8 * sp * 2, 64, 3)).astype(np.float32)
        )
        ref = model.apply(variables, x, train=False)
        got = spatial_forward_2d(variables, x, mesh, selective=True)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-4)

    def test_validates_mesh_and_shapes(self, selective_model):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            make_mesh,
        )
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.spatial import (
            make_mesh_2d,
            spatial_forward_2d,
        )

        _model, variables = selective_model
        mesh2d = make_mesh_2d(2, 4)
        with pytest.raises(ValueError, match="divisible by batch"):
            spatial_forward_2d(variables, jnp.zeros((3, 64, 64, 3)), mesh2d)
        with pytest.raises(ValueError, match="divisible by 8"):
            spatial_forward_2d(variables, jnp.zeros((2, 48, 64, 3)), mesh2d)
        with pytest.raises(ValueError, match="mesh axes"):
            spatial_forward_2d(variables, jnp.zeros((2, 64, 64, 3)), make_mesh(4))

    def test_output_sharded_on_both_axes(self, selective_model, rng):
        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.spatial import (
            make_mesh_2d,
            spatial_forward_2d,
        )

        _model, variables = selective_model
        mesh = make_mesh_2d(2, 4)
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
        out, _sel, _aux = spatial_forward_2d(variables, x, mesh, selective=True)
        assert out.shape == (2, 64, 64)
        # the result stays distributed: no single device holds the full array
        assert len(out.sharding.device_set) == 8
