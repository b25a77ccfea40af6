"""Workbench + serving tools: data splitting, WSI stitched inference, MC
uncertainty, checkpoint inspection, selection-threshold calibration,
standalone prediction, the warm HTTP server, and AOT StableHLO export.

Lazy re-exports (PEP 562): importing the package must not eagerly import any
tool (snet-split is a pure-host numpy/PIL tool and must not pay jax's
multi-second import; ``python -m ...tools.<name>`` must not double-import
siblings).

Two names are deliberately NOT re-exported: ``calibrate`` and
``tiled_inference`` collide with their submodules, and the import machinery
binds the SUBMODULE on the package whenever it loads — any function re-export
under those names is eventually shadowed (or forces the eager jax import this
module exists to avoid). ``tools.calibrate`` / ``tools.tiled_inference`` are
therefore always the submodules; call ``tools.calibrate.calibrate(...)`` /
``tools.tiled_inference.tiled_inference(...)``, or use the unambiguous lazy
exports below (``risk_coverage_curve``, ``wsi_mask``, ...).
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
    "predict_image": ".predict",
    "PredictionService": ".serve",
    "make_server": ".serve",
    "export_serving": ".export",
    "load_exported": ".export",
    "make_serving_fn": ".export",
    "wsi_mask": ".tiled_inference",
    "mc_uncertainty": ".uncertainty",
    "make_heatmap": ".wsi",
    "save_performance_as_csv": ".wsi",
    "stitch_patches": ".wsi",
    "wsi_inference": ".wsi",
}

_SUBMODULES = frozenset({
    "calibrate", "data_split", "export", "inspect_ckpt", "predict", "serve",
    "sweep", "tiled_inference", "uncertainty", "wsi",
})

__all__ = sorted(set(_EXPORTS) | _SUBMODULES)


def __getattr__(name):
    from importlib import import_module

    if name in _SUBMODULES:  # tools.calibrate etc. always mean the submodule
        return import_module("." + name, __name__)
    try:
        spec = _EXPORTS[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    module, attr = spec if isinstance(spec, tuple) else (spec, name)
    value = getattr(import_module(module, __name__), attr)
    globals()[name] = value  # cache the resolved value
    return value


def __dir__():
    return __all__
