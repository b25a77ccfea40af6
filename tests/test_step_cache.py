"""Cache-key correctness for the jitted-step caches (train_lib/eval_lib).

make_train_step/make_valid_step/make_eval_step are lru_cached on a hashable
_StepKey of the cfg fields their bodies close over. If a field the step reads
is MISSING from the key, two different configs silently share one compiled
step — these tests drive differing configs through the cached builders and
require the outputs to differ, so any future field omission fails loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.config import (
    EvalConfig,
    TrainConfig,
)
from selectivenet_for_semantic_segmentation_binary_tpu.eval_lib import make_eval_step
from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
    create_state,
    make_train_step,
    make_valid_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(model_arch="UNet_B", selective=True, loss="BCElogit",
                      batch_size=4, patch_size=16, compute_dtype="float32")
    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = create_state(cfg, model, tx, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    y = (x[..., 0] > 0).astype(np.int32)
    batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
    return cfg, model, tx, state, batch


class TestTrainStepKey:
    def test_same_cfg_reuses_step(self, setup):
        cfg, model, tx, _state, _batch = setup
        from dataclasses import replace

        s1 = make_train_step(model, cfg, tx)
        # fields OUTSIDE the key (shapes, lr, dirs) must not split the cache
        s2 = make_train_step(model, replace(cfg, batch_size=8, model_dir="/x"), tx)
        assert s1 is s2

    @staticmethod
    def _fresh(state):
        # the train step donates its state argument; copy per invocation
        return jax.tree_util.tree_map(jnp.copy, state)

    def test_s_lamb_changes_loss(self, setup):
        cfg, model, tx, state, batch = setup
        from dataclasses import replace

        _, m2 = make_train_step(model, replace(cfg, s_lamb=2.0), tx)(
            self._fresh(state), batch, 1e-3, jax.random.PRNGKey(1))
        _, m8 = make_train_step(model, replace(cfg, s_lamb=8.0), tx)(
            self._fresh(state), batch, 1e-3, jax.random.PRNGKey(1))
        assert float(m2["loss"]) != float(m8["loss"])

    def test_target_coverage_changes_loss(self, setup):
        cfg, model, tx, state, batch = setup
        from dataclasses import replace

        _, a = make_train_step(model, replace(cfg, target_coverage=0.8), tx)(
            self._fresh(state), batch, 1e-3, jax.random.PRNGKey(1))
        _, b = make_train_step(model, replace(cfg, target_coverage=0.99), tx)(
            self._fresh(state), batch, 1e-3, jax.random.PRNGKey(1))
        assert float(a["loss"]) != float(b["loss"])

    def test_valid_step_loss_matches_objective(self, setup):
        cfg, model, _tx, state, batch = setup
        m = make_valid_step(model, cfg)(self._fresh(state), batch)
        assert np.isfinite(float(m["loss"])) and float(m["loss"]) >= 0


class TestEvalStepKey:
    @pytest.fixture(scope="class")
    def eval_setup(self):
        model = build_model("UNet_B", 2, True, "float32")
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                               train=False)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)
        batch = {"input": jnp.asarray(x), "label": jnp.asarray(y)}
        return model, variables, batch

    def _cfg(self, **kw):
        base = dict(data_dir="", test_fold=1, model_dir="", model_arch=["UNet_B"],
                    selective=True, select_eval=True, patch_size=16, batch_size=4)
        base.update(kw)
        return EvalConfig(**base)

    def test_s_cut_off_changes_rejection(self, eval_setup):
        model, variables, batch = eval_setup
        lo = make_eval_step(model, self._cfg(s_cut_off=0.01), 1)(variables, batch)
        hi = make_eval_step(model, self._cfg(s_cut_off=0.99), 1)(variables, batch)
        assert int(lo["n_reject"]) < int(hi["n_reject"])

    def test_cut_off_changes_predictions(self, eval_setup):
        model, variables, batch = eval_setup
        lo = make_eval_step(model, self._cfg(cut_off=0.01), 1)(variables, batch)
        hi = make_eval_step(model, self._cfg(cut_off=0.99), 1)(variables, batch)
        # predicted-positive counts differ (cm column sums)
        assert int(lo["cm"][:, 1].sum()) > int(hi["cm"][:, 1].sum())

    def test_single_scale_changes_thresholding(self, eval_setup):
        model, variables, batch = eval_setup
        sig = make_eval_step(model, self._cfg(single_scale="sigmoid"), 1)(variables, batch)
        raw = make_eval_step(model, self._cfg(single_scale="None"), 1)(variables, batch)
        # sigmoid(logit) > 0.5 iff logit > 0; raw > 0.5 is stricter
        assert int(raw["cm"][:, 1].sum()) <= int(sig["cm"][:, 1].sum())
        assert not np.array_equal(np.asarray(raw["cm"]), np.asarray(sig["cm"]))

    def test_same_cfg_reuses_step(self, eval_setup):
        model, _variables, _batch = eval_setup
        s1 = make_eval_step(model, self._cfg(), 1)
        s2 = make_eval_step(model, self._cfg(batch_size=16), 1)  # shape not in key
        assert s1 is s2
