"""SSP partition evaluator: aggregate res.h5 files across folds.

CLI parity with reference supervized_partition/evaluate_partition.py:24-86:
prints the n_sp / ASA / BR / BP table and writes results.txt.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..ssp.evaluate import aggregate_results

    p = argparse.ArgumentParser(description="aggregate SSP partition metrics")
    p.add_argument("--odir", default="results_partition")
    p.add_argument("--cvfold", default="123456")
    args = p.parse_args(argv)

    res_files = []
    for fold in args.cvfold:
        path = os.path.join(args.odir, f"cv{fold}", "res.h5")
        if os.path.isfile(path):
            res_files.append(path)
        else:
            print(f"fold {fold}: missing {path}")
    if not res_files:
        raise SystemExit("no res.h5 files found")

    per_fold = [aggregate_results([f]) for f in res_files]
    overall = aggregate_results(res_files)
    lines = []
    for f, r in zip(res_files, per_fold):
        lines.append(
            f"{f}: n_sp {r['n_sp']:.0f}  ASA {r['ASA']:.2f}  "
            f"BR {r['BR']:.2f}  BP {r['BP']:.2f}"
        )
    lines.append(
        f"overall: n_sp {overall['n_sp']:.0f}  ASA {overall['ASA']:.2f}  "
        f"BR {overall['BR']:.2f}  BP {overall['BP']:.2f}"
    )
    out = "\n".join(lines)
    print(out)
    with open(os.path.join(args.odir, "results.txt"), "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    main()
