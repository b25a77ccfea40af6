"""Installable console entry points (``[project.scripts]`` in pyproject.toml).

The reference is driven as ``python3 train.py`` / ``python3 eval.py``
(reference README.md:28-68) and those repo-root shims are kept verbatim; this
module additionally exposes the same drivers as installed commands
(``snet-train``, ``snet-eval``, ``snet-split``, ``snet-sweep``,
``snet-inspect-ckpt``, ``snet-calibrate``, ``snet-predict``, ``snet-wsi``,
``snet-serve``, ``snet-export``)
so the framework works as a pip-installed package without a checkout.
"""

from __future__ import annotations


def _maybe_init_distributed() -> None:
    """Join a multi-process fleet when launched under a managed TPU-pod /
    cluster environment (no-op otherwise). Must run before any device access
    so the backend spans all hosts (parallel/multihost.py)."""
    from .parallel.multihost import initialize

    initialize()


def train_main() -> None:
    from .config import parse_train_args
    from .train_lib import train

    cfg = parse_train_args()
    _maybe_init_distributed()
    print("")
    print(f"args={cfg}\n")

    import jax

    print(f"# of devices: {len(jax.devices())}, mesh size: {cfg.n_devices}\n")
    train(cfg)


def eval_main() -> None:
    from .config import parse_eval_args
    from .eval_lib import evaluate

    cfg = parse_eval_args()
    _maybe_init_distributed()
    print("")
    print(f"args={cfg}\n")
    if cfg.info_print:
        print("Load Tumor Segmentation Model...")
    print("Model Prediction...")
    evaluate(cfg)


def split_main() -> None:
    from .tools.data_split import main

    main()


def sweep_main() -> None:
    from .tools.sweep import main

    _maybe_init_distributed()  # the sweep trains: same fleet semantics as train
    main()


def inspect_ckpt_main() -> None:
    from .tools.inspect_ckpt import main

    main()


def calibrate_main() -> None:
    from .tools.calibrate import main

    _maybe_init_distributed()  # calibration is eval-shaped: same fleet semantics
    main()


def predict_main() -> None:
    # single-host serving tool: no fleet init (one process owns its chips)
    from .tools.predict import main

    main()


def wsi_main() -> None:
    # single-host workbench tool (the reference's notebook ran single-process)
    from .tools.wsi import main

    main()


def serve_main() -> None:
    # single-host serving daemon: one process owns its chips, no fleet init
    from .tools.serve import main

    main()


def export_main() -> None:
    # offline artifact build: single process, no fleet init
    from .tools.export import main

    main()
