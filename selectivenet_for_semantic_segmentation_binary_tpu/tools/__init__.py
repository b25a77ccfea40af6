"""Workbench tools: data splitting, WSI stitched inference, MC uncertainty,
checkpoint inspection, selection-threshold calibration.

Lazy re-exports (PEP 562): ``python -m ...tools.<name>`` must not eagerly
import sibling tools (that triggers the runpy double-import warning and pays
every tool's import cost), and jax-heavy tools stay unloaded until used.
"""

_EXPORTS = {
    "build_fold_lists": ".data_split",
    "mine_non_tissue": ".data_split",
    "tumor_pixel_report": ".data_split",
    "tumor_proportion_histogram": ".data_split",
    "risk_coverage_curve": ".calibrate",
    "threshold_for_coverage": ".calibrate",
    "summarize_checkpoint": (".inspect_ckpt", "summarize"),
    "compare_checkpoints": (".inspect_ckpt", "compare"),
    "Variant": ".sweep",
    "default_grid": ".sweep",
    "run_sweep": ".sweep",
    "wsi_mask": ".tiled_inference",
    "mc_uncertainty": ".uncertainty",
    "make_heatmap": ".wsi",
    "save_performance_as_csv": ".wsi",
    "stitch_patches": ".wsi",
    "wsi_inference": ".wsi",
}

# These two exports share their submodule's name, so they CANNOT be lazy: the
# import machinery binds `tools.calibrate`/`tools.tiled_inference` to the
# SUBMODULE whenever it loads, which wins over __getattr__ for every later
# access — the function must eagerly overwrite that binding.
from .calibrate import calibrate  # noqa: E402,F401
from .tiled_inference import tiled_inference  # noqa: E402,F401

_EAGER = ("calibrate", "tiled_inference")

__all__ = sorted((*_EXPORTS, *_EAGER))


def __getattr__(name):
    try:
        spec = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    from importlib import import_module

    module, attr = spec if isinstance(spec, tuple) else (spec, name)
    value = getattr(import_module(module, __name__), attr)
    globals()[name] = value  # cache; also guards against submodule shadowing
    return value


def __dir__():
    return __all__
