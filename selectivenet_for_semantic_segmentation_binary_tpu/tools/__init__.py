"""Workbench tools: data splitting, WSI stitched inference, MC uncertainty."""

from .data_split import (  # noqa: F401
    build_fold_lists,
    mine_non_tissue,
    tumor_pixel_report,
    tumor_proportion_histogram,
)
from .calibrate import (  # noqa: F401
    calibrate,
    risk_coverage_curve,
    threshold_for_coverage,
)
from .inspect_ckpt import compare as compare_checkpoints  # noqa: F401
from .inspect_ckpt import summarize as summarize_checkpoint  # noqa: F401
from .sweep import Variant, default_grid, run_sweep  # noqa: F401
from .tiled_inference import tiled_inference, wsi_mask  # noqa: F401
from .uncertainty import mc_uncertainty  # noqa: F401
from .wsi import make_heatmap, save_performance_as_csv, stitch_patches, wsi_inference  # noqa: F401
