"""Host-side utilities: metrics, checkpointing, TensorBoard event writing."""

from .metrics import Evaluator, get_performance, compute_IoU, compute_mIOU  # noqa: F401
