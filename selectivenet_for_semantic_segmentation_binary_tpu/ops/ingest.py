"""Raw-uint8 serving ingest: ship bytes, normalize on device.

The reference's inference paths decode to float on the host and ship float32
tensors to the device (u-net_testing.ipynb cell 6; utils/data_utils.py:220-221
does ``/255.0`` host-side). On this framework's serving surface that transfer
is the measured bottleneck: a 128x256x256x3 float32 batch is ~100 MB and the
axon tunnel moves it at ~2.2 s/batch (docs/RESULTS.md "int8 production path",
NOTE block) — 4x the bytes the pixels actually carry.

The training path already solved this with ``--device_preproc``
(train_lib.device_preprocess: the loader ships raw uint8, the jitted step does
/255 + (x-0.5)/0.5 + flips). This module is the serving-side counterpart,
shared by Predictor, tools/tiled_inference, tools/serve and tools/wsi:

* :func:`device_ingest` — host array -> device array, PRESERVING uint8 so the
  transfer is 1 byte/pixel;
* :func:`normalize_raw` — uint8 [0, 255] or float [0, 1] -> normalized float32
  ``(x - 0.5) / 0.5``, traced into the jitted forward so XLA fuses the byte
  expansion into the first conv's prologue.

Numerics: ``u8 -> f32 * (1/255)`` matches the host pipeline's ``f32(u8)/255``
to 1 ulp (max |diff| 6e-8 over all 256 byte values; 126 of 256 values differ
in the last bit — multiply-by-reciprocal double-rounds where true division
rounds once). The same formula and tolerance the train path pins in
tests/test_device_preproc.py; serving equivalence is pinned in
tests/test_ingest.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normalize_raw(x):
    """uint8 [0, 255] or float [0, 1] pixels -> normalized float32.

    Works traced (inside jit — the dtype test is static, so jit specializes
    one program per input dtype) or eager. Float inputs are assumed already
    in [0, 1] (the host decode convention, reference data_utils.py:220-221).
    """
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) * (1.0 / 255.0)
    else:
        x = x.astype(jnp.float32)
    return (x - 0.5) / 0.5


def device_ingest(images) -> jax.Array:
    """Host array -> device array for the serving forward.

    uint8 ships as uint8 (1 byte/pixel, 4x less H2D than float32 — the
    jitted forward's :func:`normalize_raw` expands on device); anything else
    lands as float32 (float64 inputs would otherwise double the transfer and
    trip jax's x64 guard).
    """
    a = images if isinstance(images, jax.Array) else np.asarray(images)
    if a.dtype == np.uint8:
        return jnp.asarray(a)
    return jnp.asarray(a, jnp.float32)


def to_unit_float(images) -> np.ndarray:
    """Host-side uint8 [0, 255] or float -> float32 [0, 1] (numpy).

    For the rare host-side consumers of raw images (int8 calibration crops,
    heatmap overlays) that need unit-range floats regardless of ingest dtype.
    Uses the same *(1/255) formula as :func:`normalize_raw` so host and
    device conversions agree bit-exactly with each other.
    """
    a = np.asarray(images)
    if a.dtype == np.uint8:
        return a.astype(np.float32) * np.float32(1.0 / 255.0)
    return np.asarray(a, np.float32)
