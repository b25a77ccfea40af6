"""TPU-native SelectiveNet U-Net framework for binary semantic segmentation.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
``yellofi/SelectiveNet_for_semantic_segmentation_binary`` (reference mounted at
/root/reference): SelectiveNet-augmented U-Nets for binary (tumor vs. benign)
segmentation of 256x256 WSI histopathology patches, with 5-fold CV, data-parallel
training over a TPU device mesh, selective (coverage-constrained) risk losses,
on-device confusion-matrix metrics, TensorBoard logging, epoch checkpointing with
auto-resume, ensemble / in-coverage evaluation, stain-space (Gray+Hematoxylin)
inputs, WSI stitched inference, and MC stochastic-forward uncertainty.

Layout (TPU-first, not a port):
  models/    Flax U-Net / U-Net_B in NHWC (reference: model.py)
  ops/       losses, selective risk, on-device confusion matrix, Pallas kernels
  parallel/  mesh construction + sharding helpers (replaces torch DataParallel)
  data/      fold construction, patch dataset, transforms, threaded device feed
  utils/     checkpointing, TensorBoard event writer, host metric wrappers
  tools/     data-split / WSI stitching / uncertainty utilities
"""

__version__ = "0.1.0"

from .config import EvalConfig, TrainConfig  # noqa: E402,F401


def __getattr__(name):
    """Lazy top-level API (avoids importing jax/flax for config-only use)."""
    if name in ("UNet", "UNetB", "build_model"):
        from . import models

        return getattr(models, name)
    if name == "Predictor":
        from .predictor import Predictor

        return Predictor
    if name == "train":
        from .train_lib import train

        return train
    if name == "evaluate":
        from .eval_lib import evaluate

        return evaluate
    if name == "Evaluator":
        from .utils.metrics import Evaluator

        return Evaluator
    raise AttributeError(name)
