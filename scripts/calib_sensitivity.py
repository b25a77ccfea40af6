#!/usr/bin/env python3
"""int8 calibration-set sensitivity: 8 vs 64 patches (round-5 plan #7).

The int8 serving path calibrated on a hardcoded 8-patch sample through
round 4; `--calib_patches` now exposes the width. This probe quantifies the
choice on a TRAINED checkpoint: evaluates the same model bf16, int8@8 and
int8@64 on the test fold and reports the metric deltas. Absmax scales only
ever widen with more samples, so int8@64's scales are a superset bound of
int8@8's — the question is whether the extra width moves the metrics.

    python scripts/calib_sensitivity.py --data_dir D --ckpt model_epochN.ckpt

Defaults point at the canonical-run artifacts (scripts/canonical_200ep.py).
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_eval(data_dir, single_dir, extra):
    out = subprocess.run(
        [sys.executable, "eval.py", "--fold", "1", "--data_dir", data_dir,
         "--model_dir", single_dir, "--model_arch", "UNet_B",
         "--selective", "1", "--select_eval", "1", "--batch_size", "128",
         "--patch_size", "256"] + extra,
        capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    metrics = {}
    for line in out.stdout.splitlines():
        line = line.strip()
        for key in ("Acc:", "mIoU:"):
            if line.startswith(key):
                metrics[key[:-1]] = float(line[len(key):])
        if line.startswith("rejection ratio:"):
            metrics["rejection"] = float(line.split(":")[1])
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/canon200/data")
    ap.add_argument("--ckpt", default=None,
                    help="one trained checkpoint (default: newest under the "
                         "canonical run's model dir)")
    args = ap.parse_args()

    ckpt = args.ckpt
    if ckpt is None:
        import glob
        import re

        cands = glob.glob("/tmp/canon200/model/1-fold/checkpoint/"
                          "model_epoch*.ckpt")
        ckpt = max(cands, key=lambda p: int(
            re.search(r"epoch(\d+)", p).group(1)))
    single = tempfile.mkdtemp(prefix="calib_sens_")
    shutil.copy(ckpt, single)
    print(f"checkpoint: {ckpt}", flush=True)

    rows = {}
    for name, extra in (
        ("bf16", []),
        ("int8_c8", ["--quantize", "int8", "--calib_patches", "8"]),
        ("int8_c64", ["--quantize", "int8", "--calib_patches", "64"]),
    ):
        rows[name] = run_eval(args.data_dir, single, extra)
        print(f"{name}: {rows[name]}", flush=True)

    deltas = {
        "int8_c8_vs_bf16_acc": rows["int8_c8"]["Acc"] - rows["bf16"]["Acc"],
        "int8_c64_vs_bf16_acc": rows["int8_c64"]["Acc"] - rows["bf16"]["Acc"],
        "c64_vs_c8_acc": rows["int8_c64"]["Acc"] - rows["int8_c8"]["Acc"],
        "c64_vs_c8_mIoU": rows["int8_c64"]["mIoU"] - rows["int8_c8"]["mIoU"],
    }
    print("CALIB_SENSITIVITY " + json.dumps({"rows": rows,
                                             "deltas": deltas}), flush=True)


if __name__ == "__main__":
    main()
