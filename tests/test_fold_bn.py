"""BN-folding tests: the folded serving model must reproduce the eval-mode
forward of the unfolded model exactly (up to fp32 rounding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.ops.fold_bn import fold_batchnorm


def _trained_like_variables(model, rng_np, size=32, in_ch=3):
    """Init then perturb BN stats so folding is non-trivial."""
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, in_ch)), train=False)
    variables = jax.device_get(variables)

    def perturb(tree):
        for k, v in tree.items():
            if k == "bn":
                v["mean"] = 0.3 * rng_np.standard_normal(v["mean"].shape).astype(np.float32)
                v["var"] = (1.0 + 0.3 * rng_np.random(v["var"].shape)).astype(np.float32)
            elif isinstance(v, dict):
                perturb(v)

    perturb(variables["batch_stats"])
    # BN scale/bias too
    def perturb_params(tree):
        for k, v in tree.items():
            if k == "bn":
                v["scale"] = (1.0 + 0.2 * rng_np.standard_normal(v["scale"].shape)).astype(np.float32)
                v["bias"] = (0.1 * rng_np.standard_normal(v["bias"].shape)).astype(np.float32)
            elif isinstance(v, dict):
                perturb_params(v)

    perturb_params(variables["params"])
    return variables


@pytest.mark.parametrize("selective", [False, True])
def test_folded_forward_equals_eval_forward(rng, selective):
    model = build_model("UNet_B", selective=selective, compute_dtype="float32")
    variables = _trained_like_variables(model, rng)
    x = jnp.asarray(0.5 * rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    ref = model.apply(variables, x, train=False)

    folded = fold_batchnorm(variables)
    folded_model = build_model("UNet_B", selective=selective,
                               compute_dtype="float32", folded=True)
    got = folded_model.apply({"params": folded["params"]}, x, train=False)

    if selective:
        for r, g in zip(ref, got):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4)
    else:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_folded_tree_has_no_bn(rng):
    model = build_model("UNet_B", selective=False, compute_dtype="float32")
    variables = _trained_like_variables(model, rng)
    folded = fold_batchnorm(variables)
    flat = jax.tree_util.tree_leaves_with_path(folded["params"])
    assert not any("bn" in jax.tree_util.keystr(p) for p, _ in flat)
    # folded tree matches the folded model's own init structure
    folded_model = build_model("UNet_B", selective=False,
                               compute_dtype="float32", folded=True)
    ref = folded_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), train=False)

    def paths(tree):
        return {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_leaves_with_path(tree)}

    assert paths(folded["params"]) == paths(ref["params"])


def test_folding_ce_unet(rng):
    model = build_model("UNet", n_cls=2, selective=True, compute_dtype="float32")
    variables = _trained_like_variables(model, rng)
    x = jnp.asarray(0.5 * rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    ref = model.apply(variables, x, train=False)
    folded = fold_batchnorm(variables)
    folded_model = build_model("UNet", n_cls=2, selective=True,
                               compute_dtype="float32", folded=True)
    got = folded_model.apply({"params": folded["params"]}, x, train=False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-3, atol=1e-4)
