"""Compute ops: losses, selective risk, on-device metrics, Pallas kernels."""

from .losses import (  # noqa: F401
    bce_with_logits,
    softmax_cross_entropy,
    make_one_hot,
    selective_risk_b,
    selective_risk_ce,
)
from .confusion import confusion_matrix_update  # noqa: F401
