"""Data-parallel semantics on the virtual 8-device CPU mesh.

These pin the SURVEY.md §7 risk-1 invariant: the selective objective must be
computed with *global-batch* coverage (the reference's DataParallel gathers
outputs and evaluates the loss on the full batch, train.py:132-134 +
selective_loss.py:71-72). Per-shard loss averaging is NOT equivalent because
risk/coverage is nonlinear — asserted explicitly below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from selectivenet_for_semantic_segmentation_binary_tpu.ops import selective_risk_b
from selectivenet_for_semantic_segmentation_binary_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    m = make_mesh(8)
    assert m.devices.size == 8, "tests require the 8-device CPU mesh (see conftest)"
    return m


class TestMesh:
    def test_make_mesh_sizes(self, mesh):
        assert make_mesh(4).devices.size == 4
        assert make_mesh(None).devices.size == len(jax.devices())

    def test_shard_batch_layout(self, mesh, rng):
        batch = {"input": rng.standard_normal((16, 8, 8, 3)).astype(np.float32)}
        sharded = shard_batch(batch, mesh)
        assert sharded["input"].sharding.is_equivalent_to(batch_sharding(mesh), ndim=4)

    def test_replicate(self, mesh, rng):
        tree = {"w": rng.standard_normal((4, 4)).astype(np.float32)}
        rep = replicate(tree, mesh)
        assert rep["w"].sharding.is_equivalent_to(replicated_sharding(mesh), ndim=2)

    def test_fleet_sp_layout_check(self):
        """The --sp_ways fleet layout verifier rejects every bad
        process->mesh assignment with an actionable error: row spanning
        processes, non-contiguous blocks, and UNEQUAL per-process dp-row
        counts (a heterogeneous fleet would otherwise fail later, illegibly,
        inside make_array_from_process_local_data)."""
        from types import SimpleNamespace

        from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
            _verify_fleet_sp_layout,
        )

        def grid(rows):  # rows: list of per-dp-row process-index lists
            return [[SimpleNamespace(process_index=p) for p in row]
                    for row in rows]

        # good: 2 processes x 2 contiguous dp rows each
        _verify_fleet_sp_layout(grid([[0, 0], [0, 0], [1, 1], [1, 1]]))
        with pytest.raises(ValueError, match="spans processes"):
            _verify_fleet_sp_layout(grid([[0, 1], [0, 1]]))
        with pytest.raises(ValueError, match="not contiguous"):
            _verify_fleet_sp_layout(grid([[0, 0], [1, 1], [0, 0], [1, 1]]))
        with pytest.raises(ValueError, match="unequal dp-row blocks"):
            _verify_fleet_sp_layout(grid([[0, 0], [0, 0], [0, 0], [1, 1]]))


class TestGlobalCoverageSemantics:
    def _make_data(self, rng, n=16):
        out = rng.standard_normal((n, 8, 8)).astype(np.float32)
        # wildly varying per-sample selection logits -> per-shard coverage differs
        sel = (rng.standard_normal((n, 8, 8)) * 4 + np.linspace(-4, 4, n)[:, None, None]).astype(
            np.float32
        )
        y = (rng.random((n, 8, 8)) > 0.5).astype(np.float32)
        return out, sel, y

    def test_sharded_loss_equals_global(self, mesh, rng):
        out, sel, y = self._make_data(rng)
        loss_host, cov_host = selective_risk_b(out, sel, y)

        s = batch_sharding(mesh)
        f = jax.jit(selective_risk_b)
        loss_sh, cov_sh = f(
            jax.device_put(out, s), jax.device_put(sel, s), jax.device_put(y, s)
        )
        assert float(loss_sh) == pytest.approx(float(loss_host), rel=1e-5)
        assert float(cov_sh) == pytest.approx(float(cov_host), rel=1e-6)

    def test_sharded_grads_equal_global(self, mesh, rng):
        out, sel, y = self._make_data(rng)
        grad_fn = jax.grad(lambda o, s_: selective_risk_b(o, s_, y)[0], argnums=(0, 1))
        g_host = grad_fn(jnp.asarray(out), jnp.asarray(sel))

        s = batch_sharding(mesh)
        g_sh = jax.jit(grad_fn)(jax.device_put(out, s), jax.device_put(sel, s))
        for gh, gs in zip(g_host, g_sh):
            np.testing.assert_allclose(np.asarray(gs), np.asarray(gh), rtol=1e-4, atol=1e-6)

    def test_per_shard_average_is_not_the_objective(self, mesh, rng):
        """Proves the invariant is non-trivial: averaging per-shard selective
        losses diverges from the global-batch loss when coverage varies."""
        out, sel, y = self._make_data(rng)
        global_loss, _ = selective_risk_b(out, sel, y)
        shard_losses = [
            selective_risk_b(out[i : i + 2], sel[i : i + 2], y[i : i + 2])[0]
            for i in range(0, 16, 2)
        ]
        mean_shard_loss = float(np.mean([float(l) for l in shard_losses]))
        assert mean_shard_loss != pytest.approx(float(global_loss), rel=1e-3)


class TestTrainStepOnMesh:
    def test_selective_train_step_8dev(self, mesh, rng):
        """Full jitted train step over the 8-device mesh: params stay replicated,
        metrics are global, loss decreases over a few steps."""
        from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
        from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            create_state,
            make_train_step,
        )

        cfg = TrainConfig(
            model_arch="UNet_B", selective=True, loss="BCElogit", s_lamb=2.0,
            batch_size=16, patch_size=16, compute_dtype="float32",
        )
        model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
        tx = build_optimizer(cfg)
        state = create_state(cfg, model, tx, jax.random.PRNGKey(0))
        state = replicate(state, mesh)
        step = make_train_step(model, cfg, tx)

        x = rng.standard_normal((16, 16, 16, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)
        batch = shard_batch({"input": x, "label": y}, mesh)

        losses = []
        for _ in range(5):
            state, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
        # params replicated after update
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_equivalent_to(replicated_sharding(mesh), ndim=leaf.ndim)
        # confusion matrix covers the global batch
        assert int(metrics["n_pix"]) == 16 * 16 * 16

    def test_mesh_size_independence(self, rng):
        """The same batch must produce the same loss on 1, 2, 4, 8 devices —
        the DataParallel-equivalence guarantee."""
        from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
        from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            create_state,
            make_train_step,
        )

        cfg = TrainConfig(
            model_arch="UNet_B", selective=True, loss="BCElogit",
            batch_size=8, patch_size=16, compute_dtype="float32",
        )
        x = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)

        losses = {}
        for n in (1, 2, 4, 8):
            mesh = make_mesh(n)
            model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
            tx = build_optimizer(cfg)
            state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)), mesh)
            step = make_train_step(model, cfg, tx)
            batch = shard_batch({"input": x, "label": y}, mesh)
            _, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(1))
            losses[n] = float(metrics["loss"])
        base = losses[1]
        for n, l in losses.items():
            assert l == pytest.approx(base, rel=1e-4), f"mesh size {n}: {l} vs {base}"

    def test_per_replica_bn_mesh_size_independence(self, rng):
        """bn_mode='per_replica' groups are LOGICAL sub-batches, not physical
        shards: with a fixed replica count (here 2, the reference's
        DataParallel scatter) the loss is identical on any mesh size — the
        same invariance the global objective has."""
        from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
        from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            create_state,
            make_train_step,
        )

        cfg = TrainConfig(
            model_arch="UNet_B", selective=True, loss="BCElogit",
            batch_size=8, patch_size=16, compute_dtype="float32",
            bn_mode="per_replica", bn_replicas=2,
        )
        x = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
        y = (x[..., 0] > 0).astype(np.int32)

        losses = {}
        for n in (1, 4, 8):
            mesh = make_mesh(n)
            model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective,
                                cfg.compute_dtype, bn_mode="per_replica",
                                bn_groups=2)
            tx = build_optimizer(cfg)
            state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)), mesh)
            step = make_train_step(model, cfg, tx)
            batch = shard_batch({"input": x, "label": y}, mesh)
            _, metrics = step(state, batch, 1e-3, jax.random.PRNGKey(1))
            losses[n] = float(metrics["loss"])
        for n, l in losses.items():
            assert l == pytest.approx(losses[1], rel=1e-4), f"mesh {n}: {losses}"

    def test_resolve_bn_groups(self):
        """--bn_mode per_replica resolution: 0 -> one group per mesh device;
        non-divisible batch sizes are rejected with the flag names."""
        from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
        from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
            resolve_bn_groups,
        )

        mesh = make_mesh(4)
        assert resolve_bn_groups(TrainConfig(batch_size=16), mesh) == 1
        assert resolve_bn_groups(
            TrainConfig(batch_size=16, bn_mode="per_replica"), mesh) == 4
        assert resolve_bn_groups(
            TrainConfig(batch_size=16, bn_mode="per_replica", bn_replicas=8),
            mesh) == 8
        with pytest.raises(ValueError, match="divisible"):
            resolve_bn_groups(
                TrainConfig(batch_size=10, bn_mode="per_replica",
                            bn_replicas=4), mesh)
