"""Day-one real-weights mIoU parity check against the reference README table.

The released checkpoints and benchmark datasets are not available in the
build environment, so bit-level mIoU parity cannot be *executed* here — but
it can be made a one-command affair for the first machine that has them:

    python -m catseg_tpu.tools.parity_check \
        --checkpoint /path/model_base.pth --config vitb384 \
        [--data-root $DETECTRON2_DATASETS] [--tol 0.5] [--limit N]

Runs the full 6-benchmark sweep with the eval.sh protocol (sliding window,
POOLING_SIZES [1,1] — /root/reference/eval.sh:28-103), compares each mIoU
against the published table (/root/reference/README.md:88-111, mirrored in
BASELINE.md), and prints one PASS/FAIL line per benchmark plus an overall
verdict (exit code 1 on any FAIL).

``--config vitb384`` checks against the CAT-Seg (B) row, ``vitl336`` the
CAT-Seg (L) row.  ``--limit`` subsamples for a smoke run — published numbers
only hold for the full sets, so limited runs report DELTA without PASS/FAIL.
"""

from __future__ import annotations

import argparse
import sys

# /root/reference/README.md:92-97 (B) and :104-109 (L); keys = our benchmark
# registry names (evaluation/harness.py).
PUBLISHED_MIOU = {
    "vitb384": {"ade847": 12.0, "pc459": 19.0, "ade150": 31.8,
                "pc59": 57.5, "voc20": 94.6, "voc20b": 77.3},
    "vitl336": {"ade847": 16.0, "pc459": 23.8, "ade150": 37.9,
                "pc59": 63.3, "voc20": 97.0, "voc20b": 82.5},
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True,
                    help="released model_base.pth / model_large.pth (or .npz)")
    ap.add_argument("--config", default="vitb384", choices=sorted(PUBLISHED_MIOU))
    ap.add_argument("--data-root", default=None, help="defaults to $DETECTRON2_DATASETS")
    ap.add_argument("--tol", type=float, default=0.5,
                    help="PASS tolerance in mIoU points (default ±0.5)")
    ap.add_argument("--limit", type=int, default=None,
                    help="smoke-run image cap (delta only, no PASS/FAIL)")
    ap.add_argument("--benchmarks", default=None,
                    help="comma subset (default: all six published)")
    from .common import add_device_arg, apply_device, probe_device

    add_device_arg(ap)
    args = ap.parse_args(argv)
    apply_device(args)
    probe_device()

    from ..evaluation.harness import evaluate_benchmark
    from .common import load_params, resolve_config

    table = PUBLISHED_MIOU[args.config]
    benches = (args.benchmarks.split(",") if args.benchmarks else list(table))
    cfg = resolve_config(args.config, [])
    params = load_params(args.checkpoint, cfg)

    rows, failed = [], []
    for bench in benches:
        bench = bench.strip()
        m = evaluate_benchmark(params, cfg, bench, root=args.data_root,
                               limit=args.limit, sliding=True)
        got = float(m["mIoU"])
        want = table[bench]
        delta = got - want
        if args.limit:
            status = f"DELTA {delta:+.2f} (--limit {args.limit}: no PASS/FAIL)"
        elif abs(delta) <= args.tol:
            status = f"PASS ({delta:+.2f} within ±{args.tol})"
        else:
            status = f"FAIL ({delta:+.2f} exceeds ±{args.tol})"
            failed.append(bench)
        row = f"{bench:8s} mIoU {got:6.2f}  published {want:6.2f}  {status}"
        rows.append(row)
        print(row, flush=True)

    print("-" * 64)
    if args.limit:
        print(f"smoke run (--limit {args.limit}): deltas above are indicative only")
    elif failed:
        print(f"PARITY FAIL: {', '.join(failed)} outside ±{args.tol} mIoU")
        sys.exit(1)
    else:
        print(f"PARITY PASS: all {len(rows)} benchmarks within ±{args.tol} mIoU "
              f"of /root/reference/README.md")


if __name__ == "__main__":
    main()
