"""Subprocess worker for the real multi-process multi-host test.

Each process hosts 8//nproc virtual CPU devices; jax.distributed + gloo
collectives stitch them into one 8-device global mesh, so the SAME train step
and loader semantics run as a genuine multi-host fleet (process-sliced decode
+ jax.make_array_from_process_local_data assembly, parallel/multihost.py).

Usage: python _multihost_worker.py <pid> <nproc> <port> <data_dir> \
           [--sp_ways N] <out_json>

``--sp_ways N``: lay the same 8 global devices out as a 2-D (dp, sp) mesh
(parallel/mesh.py make_mesh_dp_sp) so the fleet run additionally shards image
rows across each process's local devices — the multi-host spatial-parallel
training regime. The parent asserts its loss trajectory matches plain dp8.
"""

import json
import os
import sys


def main() -> None:
    argv = list(sys.argv[1:])
    sp_ways = 1
    if "--sp_ways" in argv:
        i = argv.index("--sp_ways")
        sp_ways = int(argv[i + 1])
        del argv[i : i + 2]
    pid, nproc, port = int(argv[0]), int(argv[1]), argv[2]
    data_dir, out_path = argv[3], argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 // nproc)
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    from selectivenet_for_semantic_segmentation_binary_tpu.config import TrainConfig
    from selectivenet_for_semantic_segmentation_binary_tpu.data import (
        PatchDataset,
        PatchLoader,
        construct_train_valid,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model
    from selectivenet_for_semantic_segmentation_binary_tpu.optim import build_optimizer
    from selectivenet_for_semantic_segmentation_binary_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh_dp_sp,
        replicate,
    )
    from selectivenet_for_semantic_segmentation_binary_tpu.train_lib import (
        create_state,
        make_train_step,
    )

    assert len(jax.devices()) == 8, f"expected 8 global devices, {len(jax.devices())}"

    cfg = TrainConfig(
        data_dir=data_dir, fold=1, model_arch="UNet_B", selective=True,
        loss="BCElogit", s_lamb=2.0, compute_dtype="float32",
        batch_size=8, patch_size=32, drop_last=True, seed=42,
        sp_ways=sp_ways,
    )
    mesh = make_mesh_dp_sp(None, sp_ways, cfg.batch_size, cfg.patch_size)
    train_list, _ = construct_train_valid(data_dir, test_fold=1, seed=cfg.seed)
    ds = PatchDataset(data_dir, train_list, cfg.patch_mag, cfg.patch_size, "RGB")
    loader = PatchLoader(
        ds, cfg.batch_size, shuffle=True, num_workers=2, drop_last=True,
        seed=cfg.seed, sharding=batch_sharding(mesh),
        process_index=pid, process_count=nproc,
        device_preproc=True, random_flip=True,
    )

    model = build_model(cfg.model_arch, cfg.n_cls, cfg.selective, cfg.compute_dtype)
    tx = build_optimizer(cfg)
    state = replicate(create_state(cfg, model, tx, jax.random.PRNGKey(0)), mesh)
    step = make_train_step(model, cfg, tx)

    losses, coverages = [], []
    for i, batch in enumerate(loader):
        if i >= 2:
            break
        device_batch = {k: batch[k] for k in ("input", "label", "flips") if k in batch}
        state, metrics = step(state, device_batch, cfg.lr, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        coverages.append(float(metrics["coverage"]))

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "coverages": coverages}, f)


if __name__ == "__main__":
    main()
