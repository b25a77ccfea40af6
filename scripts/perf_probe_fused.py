"""Decompose classic vs fused trunk: forward-only and fwd+bwd step times."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from selectivenet_for_semantic_segmentation_binary_tpu.models import build_model

N, P = 128, 256


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, P, P, 3)), jnp.float32)
    y = jnp.asarray((rng.random((N, P, P)) > 0.7), jnp.float32)

    for fused in (False, True):
        model = build_model("UNet_B", selective=True, compute_dtype="bfloat16",
                            fused=fused)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
        params, stats = variables["params"], variables["batch_stats"]

        @jax.jit
        def fwd(params, stats, x):
            out, mut = model.apply({"params": params, "batch_stats": stats},
                                   x, train=True, mutable=["batch_stats"])
            return out[0]

        def loss_fn(params, stats, x):
            (out, sel, aux), mut = model.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            p = jax.nn.log_sigmoid(out)
            q = jax.nn.log_sigmoid(-out)
            bce = -jnp.mean(y * p + (1 - y) * q)
            return bce + 0.1 * jnp.mean(jax.nn.sigmoid(sel)) + 0.1 * jnp.mean(aux)

        grad = jax.jit(jax.grad(loss_fn))

        t_f = timeit(fwd, params, stats, x)
        t_fb = timeit(grad, params, stats, x)
        print(f"fused={fused}: fwd {t_f*1e3:7.1f} ms   fwd+bwd {t_fb*1e3:7.1f} ms"
              f"   ({N/t_fb:.0f} p/s)", flush=True)


if __name__ == "__main__":
    main()
