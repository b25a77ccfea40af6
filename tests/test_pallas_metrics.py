"""Pallas fused-eval-metrics kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles natively on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from selectivenet_for_semantic_segmentation_binary_tpu.ops.confusion import (
    PAD_LABEL,
    confusion_matrix_update,
)
from selectivenet_for_semantic_segmentation_binary_tpu.ops.pallas_metrics import (
    fused_eval_metrics,
)


def _xla_reference(output, label, selection=None, apply_sigmoid=True,
                   cut_off=0.5, s_cut_off=0.5):
    prob = 1 / (1 + np.exp(-output)) if apply_sigmoid else output
    pred = (prob > cut_off).astype(np.int32)
    valid = (label >= 0) & (label < 2)
    sel_mask = None
    n_reject = 0
    if selection is not None:
        s = 1 / (1 + np.exp(-selection)) if apply_sigmoid else selection
        sel_mask = (s > s_cut_off).astype(np.int32)
        n_reject = int((valid & (sel_mask == 0)).sum())
    cm = np.asarray(confusion_matrix_update(
        jnp.asarray(label), jnp.asarray(pred), 2,
        jnp.asarray(sel_mask) if sel_mask is not None else None,
    ))
    return cm, n_reject, int(valid.sum())


class TestFusedEvalMetrics:
    def test_plain_matches_xla(self, rng):
        out = rng.standard_normal((4, 33, 47)).astype(np.float32)  # awkward shape
        lab = rng.integers(0, 2, (4, 33, 47)).astype(np.int32)
        got = fused_eval_metrics(jnp.asarray(out), jnp.asarray(lab), interpret=True)
        cm, _, n_pix = _xla_reference(out, lab)
        np.testing.assert_array_equal(np.asarray(got["cm"]), cm)
        assert int(got["n_pix"]) == n_pix

    def test_selective_matches_xla(self, rng):
        out = rng.standard_normal((2, 64, 64)).astype(np.float32)
        sel = rng.standard_normal((2, 64, 64)).astype(np.float32)
        lab = rng.integers(0, 2, (2, 64, 64)).astype(np.int32)
        got = fused_eval_metrics(
            jnp.asarray(out), jnp.asarray(lab), jnp.asarray(sel),
            selective=True, interpret=True,
        )
        cm, n_reject, n_pix = _xla_reference(out, lab, sel)
        np.testing.assert_array_equal(np.asarray(got["cm"]), cm)
        assert int(got["n_reject"]) == n_reject
        assert int(got["n_pix"]) == n_pix

    def test_padded_labels_excluded(self, rng):
        out = rng.standard_normal((2, 16, 16)).astype(np.float32)
        lab = rng.integers(0, 2, (2, 16, 16)).astype(np.int32)
        lab[1] = PAD_LABEL  # a fully padded sample
        got = fused_eval_metrics(jnp.asarray(out), jnp.asarray(lab), interpret=True)
        cm, _, n_pix = _xla_reference(out, lab)
        np.testing.assert_array_equal(np.asarray(got["cm"]), cm)
        assert int(got["n_pix"]) == n_pix == 16 * 16

    def test_custom_cutoffs(self, rng):
        out = rng.standard_normal((1, 32, 32)).astype(np.float32)
        sel = rng.standard_normal((1, 32, 32)).astype(np.float32)
        lab = rng.integers(0, 2, (1, 32, 32)).astype(np.int32)
        got = fused_eval_metrics(
            jnp.asarray(out), jnp.asarray(lab), jnp.asarray(sel),
            selective=True, cut_off=0.3, s_cut_off=0.7, interpret=True,
        )
        cm, n_reject, _ = _xla_reference(out, lab, sel, cut_off=0.3, s_cut_off=0.7)
        np.testing.assert_array_equal(np.asarray(got["cm"]), cm)
        assert int(got["n_reject"]) == n_reject

    def test_no_sigmoid_mode(self, rng):
        out = rng.random((1, 32, 32)).astype(np.float32)
        lab = rng.integers(0, 2, (1, 32, 32)).astype(np.int32)
        got = fused_eval_metrics(
            jnp.asarray(out), jnp.asarray(lab), apply_sigmoid=False, interpret=True
        )
        cm, _, _ = _xla_reference(out, lab, apply_sigmoid=False)
        np.testing.assert_array_equal(np.asarray(got["cm"]), cm)

    def test_large_batch_multi_tile(self, rng):
        """> one (512, 128) tile -> exercises cross-grid accumulation."""
        out = rng.standard_normal((8, 128, 128)).astype(np.float32)
        lab = rng.integers(0, 2, (8, 128, 128)).astype(np.int32)
        got = fused_eval_metrics(jnp.asarray(out), jnp.asarray(lab), interpret=True)
        cm, _, n_pix = _xla_reference(out, lab)
        np.testing.assert_array_equal(np.asarray(got["cm"]), cm)
        assert int(got["n_pix"]) == n_pix == 8 * 128 * 128
