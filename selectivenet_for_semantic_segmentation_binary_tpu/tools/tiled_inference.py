"""Exact seamless whole-slide inference via overlapped tiling.

The reference handles slides larger than a patch by running the net per
256x256 patch and stitching the outputs (u-net_testing.ipynb cells 4-8) —
every patch border is a seam where the conv zero-padding bites, so the
stitched mask has grid artifacts. It also demonstrates that the FCN accepts
bigger tiles whole (cells 64-74), which is exact but memory-bound.

This module computes the EXACT full-image forward with bounded memory:

* the output is partitioned into chunks; each chunk is computed from a
  fixed-size input window that extends ``halo`` pixels beyond the chunk on
  every side, where ``halo`` >= the network's receptive-field radius
  (UNet_B/UNet: 44 px — 2+4+8+16 down the encoder and 8+4+2 back up the
  decoder, transposed convs k=s contribute 0);
* windows are CLAMPED into the image, so at true image borders the window is
  flush with the border and the per-layer conv zero-padding applies exactly
  as in the unsharded forward — no border approximation anywhere;
* window origins are rounded down to multiples of 8 so the three max-pool
  grids stay aligned with the full-image computation (``halo`` carries 8 px
  of alignment slack on top of the receptive field);
* all windows are one batch: on a mesh they shard across chips like any other
  batch, turning spatial partitioning into plain data parallelism.

Equality with the monolithic forward is asserted pixel-exactly in
tests/test_tiled_inference.py.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# receptive-field radius of the UNet trunk (see module docstring) plus 8 px
# of pool-alignment slack, rounded to a multiple of 8
RECEPTIVE_RADIUS = 44
DEFAULT_HALO = 56
GRID = 8  # input dims must be divisible by 2^(#pools)


def _window_origin(chunk_start: int, halo: int, win: int, limit: int) -> int:
    """Clamped, GRID-aligned window origin covering [chunk_start - halo, ...)."""
    w0 = min(max(chunk_start - halo, 0), max(limit - win, 0))
    return (w0 // GRID) * GRID


def tiled_inference(
    apply_fn,
    image: jax.Array,
    tile: Tuple[int, int] = (512, 512),
    halo: int = DEFAULT_HALO,
    batch_size: int = 8,
    mesh=None,
    jit_apply: bool = True,
):
    """Exact full-image forward of a fully-convolutional NHWC model.

    Args:
        apply_fn: (N, h, w, C) -> (N, h, w) or (N, h, w, K) maps, or a tuple
            of such (the selective three-head forward); must be
            shape-polymorphic (the UNet models are). Trailing channel dims
            (the CE-head UNet's K=n_cls planes) are preserved in the output.
        image: (H, W, C) float input, H and W divisible by 8.
        tile: output chunk size per window (each dim divisible by 8).
        halo: overlap margin, >= RECEPTIVE_RADIUS + 8 alignment slack.
        batch_size: windows evaluated per device batch.
        mesh: optional 1-D device mesh — window batches are sharded over it
            (data-parallel windows: zero cross-chip communication, the
            complement of parallel.spatial's row sharding). The tail batch is
            padded to the mesh size; padded windows are computed and dropped.
        jit_apply: wrap apply_fn in jax.jit here (default). Pass False when
            apply_fn is already jitted by the caller — re-wrapping a fresh
            closure per call would recompile the forward for every image
            (the Predictor's cached serving path relies on this).
    Returns:
        (H, W) array, or a tuple of them if apply_fn returns a tuple.
    """
    H, W, _ = image.shape
    th, tw = tile
    if H % GRID or W % GRID:
        raise ValueError(f"image dims must be divisible by {GRID}, got {(H, W)}")
    if halo < RECEPTIVE_RADIUS + GRID:
        raise ValueError(f"halo must be >= {RECEPTIVE_RADIUS + GRID}, got {halo}")

    win_h = min(H, th + 2 * halo)
    win_w = min(W, tw + 2 * halo)
    win_h = ((win_h + GRID - 1) // GRID) * GRID
    win_w = ((win_w + GRID - 1) // GRID) * GRID

    # build the window list
    jobs = []  # (r0, c0, chunk_h, chunk_w, w_r0, w_c0)
    for r0 in range(0, H, th):
        ch = min(th, H - r0)
        wr = _window_origin(r0, halo, win_h, H)
        for c0 in range(0, W, tw):
            cw = min(tw, W - c0)
            wc = _window_origin(c0, halo, win_w, W)
            jobs.append((r0, c0, ch, cw, wr, wc))

    image = jnp.asarray(image)
    batched_fn = jax.jit(apply_fn) if jit_apply else apply_fn
    if mesh is not None:
        from ..parallel.mesh import batch_sharding

        n_dev = int(mesh.devices.size)
        sharding = batch_sharding(mesh)
        if batch_size % n_dev:  # keep full batches evenly sharded
            batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev

    outputs = None
    n_outputs = None
    as_tuple = False
    for lo in range(0, len(jobs), batch_size):
        chunk_jobs = jobs[lo : lo + batch_size]
        batch = jnp.stack([
            jax.lax.dynamic_slice(image, (wr, wc, 0), (win_h, win_w, image.shape[-1]))
            for (_, _, _, _, wr, wc) in chunk_jobs
        ])
        if mesh is not None:
            pad = (-len(chunk_jobs)) % n_dev
            if pad:  # repeat the last window; stitch loop below ignores pads
                batch = jnp.concatenate([batch, jnp.repeat(batch[-1:], pad, 0)])
            batch = jax.device_put(batch, sharding)
        out = batched_fn(batch)
        is_tuple = isinstance(out, tuple)
        outs = out if is_tuple else (out,)
        if outputs is None:
            n_outputs = len(outs)
            # (H, W) plus any trailing channel dims (CE heads emit (N,h,w,K))
            outputs = [
                np.zeros((H, W) + np.asarray(o).shape[3:], np.asarray(o).dtype)
                for o in outs
            ]
            as_tuple = is_tuple
        for k in range(n_outputs):
            host = np.asarray(outs[k])
            for j, (r0, c0, ch, cw, wr, wc) in enumerate(chunk_jobs):
                outputs[k][r0 : r0 + ch, c0 : c0 + cw] = host[
                    j, r0 - wr : r0 - wr + ch, c0 - wc : c0 - wc + cw
                ]

    return tuple(outputs) if as_tuple else outputs[0]


def wsi_mask(
    model,
    variables,
    image: np.ndarray,
    selective: bool = False,
    cut_off: float = 0.5,
    s_cut_off: float = 0.5,
    tile: Tuple[int, int] = (512, 512),
    halo: int = DEFAULT_HALO,
    batch_size: int = 8,
    mesh=None,
    apply_fn=None,
):
    """Seamless full-slide probability map + binary mask (+ selection mask).

    ``image``: (H, W, C) raw pixels — float [0, 1] (reference decode
    convention) or uint8 [0, 255]; uint8 slides transfer to the device as
    bytes (4x less H2D) and the normalization (x-0.5)/0.5 fuses into the
    forward either way (ops/ingest.py). ``mesh`` shards window batches
    across chips (see tiled_inference). ``apply_fn``: optional pre-jitted
    tuple-returning forward (batch -> (f[, g, h])) — when given, model and
    variables are unused, the caller's jit cache is reused across calls,
    and the fn receives RAW windows (it must normalize itself, as the
    Predictor's cached wrapper does).
    """
    from ..ops.ingest import device_ingest, normalize_raw

    prebuilt = apply_fn is not None
    if not prebuilt:
        def apply_fn(batch):
            out = model.apply(
                {"params": variables["params"], "batch_stats": variables["batch_stats"]},
                normalize_raw(batch), train=False,
            )
            return out if isinstance(out, tuple) else (out,)

    outs = tiled_inference(apply_fn, device_ingest(image), tile, halo,
                           batch_size, mesh=mesh, jit_apply=not prebuilt)
    if not isinstance(outs, tuple):
        # a prebuilt apply_fn returning a bare array (natural for
        # non-selective models) must not be mistaken for per-head outputs:
        # outs[0] of a bare (H, W) map would be its first ROW
        outs = (outs,)
    prob = _tumor_prob(outs[0])
    result = {"prob": prob, "pred": (prob > cut_off).astype(np.uint8)}
    if selective and len(outs) >= 2:
        sel_prob = _tumor_prob(outs[1])
        result["selection"] = (sel_prob > s_cut_off).astype(np.uint8)
    return result


def _tumor_prob(logits: np.ndarray) -> np.ndarray:
    """(H, W) logits -> sigmoid; (H, W, K) CE-head logits -> softmax class-1
    plane (the tumor class, reference eval.py:227-233 convention)."""
    if logits.ndim == 2:
        return 1.0 / (1.0 + np.exp(-logits))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True))[..., 1]
