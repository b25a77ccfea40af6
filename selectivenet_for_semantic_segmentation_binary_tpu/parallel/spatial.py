"""Spatially-partitioned U-Net inference: shard the image H axis over the mesh.

The reference's only big-input options are per-patch tiling with seams
(u-net_testing.ipynb cells 4-8) or a monolithic forward bounded by one
device's memory (cells 64-74). tools/tiled_inference.py removes the seams but
still computes every window on one chip. This module is the multi-chip path —
the segmentation analog of sequence parallelism (SURVEY.md §2.2):

* the input (N, H, W, C) is sharded on H across the 1-D mesh;
* every 3x3 convolution exchanges one-row halos with its mesh neighbors via
  ``jax.lax.ppermute`` inside ``shard_map`` (edge shards receive zeros, which
  IS the conv's own zero padding, so the result is exact);
* 2x2 max-pools and k=2 s=2 transposed convs are shard-local (row-aligned as
  long as each shard's height stays divisible by 8 = 2^#pools);
* BatchNorm runs in inference mode (running stats, elementwise), so no
  cross-shard statistics are needed.

The forward consumes the models' own {'params', 'batch_stats'} pytree
(models/unet.py naming) and is asserted equal to the monolithic
``model.apply`` on the virtual 8-device CPU mesh (tests/test_spatial.py).

Constraint: H must be divisible by 8 * mesh_size.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from .mesh import DATA_AXIS, SPATIAL_AXIS


def _halo_exchange_rows(x: jax.Array, axis_name: str) -> jax.Array:
    """(N, h, W, C) -> (N, h+2, W, C): neighbors' edge rows stitched on,
    zeros at the global top/bottom (== the 3x3 conv's zero padding)."""
    n = jax.lax.psum(1, axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # my last row -> lower neighbor's top
    up = [(i + 1, i) for i in range(n - 1)]     # my first row -> upper neighbor's bottom
    top_halo = jax.lax.ppermute(x[:, -1:], axis_name, down)
    bottom_halo = jax.lax.ppermute(x[:, :1], axis_name, up)
    return jnp.concatenate([top_halo, x, bottom_halo], axis=1)


def _conv3x3(x: jax.Array, kernel: jax.Array, bias: jax.Array,
             axis_name: str, dtype) -> jax.Array:
    x = _halo_exchange_rows(x, axis_name)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),  # H handled by the halo, W by zero padding
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def _conv1x1(x: jax.Array, kernel: jax.Array, bias: jax.Array, dtype) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def _bn_eval(x: jax.Array, scale, bias, mean, var, dtype, eps: float = 1e-5):
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - mean) * inv * scale + bias).astype(dtype)


def _cbr(x, params, stats, axis_name, dtype):
    x = _conv3x3(x, params["conv"]["kernel"], params["conv"]["bias"], axis_name, dtype)
    if "bn" in params:
        bn, s = params["bn"], stats["bn"]
        x = _bn_eval(x, bn["scale"], bn["bias"], s["mean"], s["var"], dtype)
    return jax.nn.relu(x)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _upconv(x, params, dtype):
    # k=2, s=2 transposed conv is shard-local: each output row depends on
    # exactly one input row. flax ConvTranspose kernel layout (kh, kw, in, out).
    y = jax.lax.conv_transpose(
        x.astype(dtype), params["convt"]["kernel"].astype(dtype),
        strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + params["convt"]["bias"].astype(dtype)


def _trunk(x, tp, ts, ax, dtype):
    """UNet trunk with halo-exchanged convs (topology of models/unet.py)."""
    e1 = _cbr(_cbr(x, tp["enc1_1"], ts.get("enc1_1", {}), ax, dtype),
              tp["enc1_2"], ts.get("enc1_2", {}), ax, dtype)
    e2 = _cbr(_cbr(_pool(e1), tp["enc2_1"], ts.get("enc2_1", {}), ax, dtype),
              tp["enc2_2"], ts.get("enc2_2", {}), ax, dtype)
    e3 = _cbr(_cbr(_pool(e2), tp["enc3_1"], ts.get("enc3_1", {}), ax, dtype),
              tp["enc3_2"], ts.get("enc3_2", {}), ax, dtype)
    b = _cbr(_cbr(_pool(e3), tp["dec4_2"], ts.get("dec4_2", {}), ax, dtype),
             tp["dec4_1"], ts.get("dec4_1", {}), ax, dtype)
    d3 = jnp.concatenate([_upconv(b, tp["unpool3"], dtype), e3], axis=-1)
    d3 = _cbr(_cbr(d3, tp["dec3_2"], ts.get("dec3_2", {}), ax, dtype),
              tp["dec3_1"], ts.get("dec3_1", {}), ax, dtype)
    d2 = jnp.concatenate([_upconv(d3, tp["unpool2"], dtype), e2], axis=-1)
    d2 = _cbr(_cbr(d2, tp["dec2_2"], ts.get("dec2_2", {}), ax, dtype),
              tp["dec2_1"], ts.get("dec2_1", {}), ax, dtype)
    d1 = jnp.concatenate([_upconv(d2, tp["unpool1"], dtype), e1], axis=-1)
    d1 = _cbr(_cbr(d1, tp["dec1_2"], ts.get("dec1_2", {}), ax, dtype),
              tp["dec1_1"], ts.get("dec1_1", {}), ax, dtype)
    return d1


def spatial_forward(
    variables: Dict,
    x: jax.Array,
    mesh: Mesh,
    selective: bool = False,
    compute_dtype=jnp.float32,
) -> Union[jax.Array, Tuple[jax.Array, ...]]:
    """Spatially-sharded eval-mode UNet_B forward.

    Args:
        variables: {'params'[, 'batch_stats']} from models/unet.py (the
            BN-folded tree from ops/fold_bn.py works too).
        x: (N, H, W, C) with H divisible by 8 * mesh size.
    Returns:
        (N, H, W) logits, or (output, select, aux) when selective — H-sharded
        jax.Arrays on the mesh.
    """
    n = mesh.devices.size
    H = x.shape[1]
    if H % (8 * n) != 0:
        raise ValueError(f"H={H} must be divisible by 8*mesh={8 * n}")

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    dtype = jnp.dtype(compute_dtype)

    sharded = _build_sharded(mesh, selective, dtype)
    x = jax.device_put(x, NamedSharding(mesh, P(None, DATA_AXIS, None, None)))
    out = sharded(params, stats, x)
    return out if selective else out[0]


def make_mesh_2d(batch_ways: int, spatial_ways: int) -> Mesh:
    """(DATA_AXIS, SPATIAL_AXIS) mesh over the first batch_ways*spatial_ways
    devices — DP x SP for batched whole-tile inference."""
    import numpy as np

    n = batch_ways * spatial_ways
    devices = jax.devices()
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:n]).reshape(batch_ways, spatial_ways),
        (DATA_AXIS, SPATIAL_AXIS),
    )


def spatial_forward_2d(
    variables: Dict,
    x: jax.Array,
    mesh: Mesh,
    selective: bool = False,
    compute_dtype=jnp.float32,
) -> Union[jax.Array, Tuple[jax.Array, ...]]:
    """2-D sharded eval-mode forward: batch over DATA_AXIS, image rows over
    SPATIAL_AXIS (halo exchange only along SPATIAL_AXIS neighbors — the batch
    dimension is embarrassingly parallel, so its mesh axis carries zero
    communication). The scale-out regime for batched WSI whole-tile serving:
    dp x sp chips process dp tiles concurrently, each tile split sp ways.

    Args:
        variables: {'params'[, 'batch_stats']} (models/unet.py naming).
        x: (N, H, W, C); N divisible by the DATA_AXIS size, H divisible by
           8 * SPATIAL_AXIS size.
        mesh: a (DATA_AXIS, SPATIAL_AXIS) mesh — see ``make_mesh_2d``.
    """
    if set(mesh.axis_names) != {DATA_AXIS, SPATIAL_AXIS}:
        raise ValueError(f"mesh axes must be ({DATA_AXIS}, {SPATIAL_AXIS}), "
                         f"got {mesh.axis_names}")
    dp = mesh.shape[DATA_AXIS]
    sp = mesh.shape[SPATIAL_AXIS]
    N, H = x.shape[0], x.shape[1]
    if N % dp != 0:
        raise ValueError(f"N={N} must be divisible by batch mesh axis {dp}")
    if H % (8 * sp) != 0:
        raise ValueError(f"H={H} must be divisible by 8*spatial mesh axis {8 * sp}")

    params = variables["params"]
    stats = variables.get("batch_stats", {})
    dtype = jnp.dtype(compute_dtype)

    sharded = _build_sharded(mesh, selective, dtype,
                             batch_axis=DATA_AXIS, h_axis=SPATIAL_AXIS)
    x = jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None))
    )
    out = sharded(params, stats, x)
    return out if selective else out[0]


@functools.lru_cache(maxsize=16)
def _build_sharded(mesh: Mesh, selective: bool, dtype,
                   batch_axis: Optional[str] = None,
                   h_axis: str = DATA_AXIS):
    """Build + jit the shard_map forward once per (mesh, axes, selective,
    dtype) — rebuilding the closure per call would recompile the full UNet
    every invocation. ``batch_axis=None`` is the 1-D H-only sharding; naming
    both axes gives the 2-D (batch x rows) regime: halos ride only the
    ``h_axis`` neighbors, the batch axis needs no communication at all."""

    def fwd(params, stats, x_local):
        feat = _trunk(x_local, params["trunk"], stats.get("trunk", {}), h_axis, dtype)
        out = _conv1x1(feat, params["conv1x1"]["conv"]["kernel"],
                       params["conv1x1"]["conv"]["bias"], dtype)[..., 0]
        out = out.astype(jnp.float32)
        if not selective:
            return (out,)
        sel = _conv1x1(feat, params["conv_select"]["conv"]["kernel"],
                       params["conv_select"]["conv"]["bias"], dtype)[..., 0]
        aux = _conv1x1(feat, params["conv_aux"]["conv"]["kernel"],
                       params["conv_aux"]["conv"]["bias"], dtype)[..., 0]
        return out, sel.astype(jnp.float32), aux.astype(jnp.float32)

    spec_x = P(batch_axis, h_axis, None, None)
    spec_out = P(batch_axis, h_axis, None)
    return jax.jit(shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), spec_x),
        out_specs=(spec_out,) * (3 if selective else 1),
    ))
