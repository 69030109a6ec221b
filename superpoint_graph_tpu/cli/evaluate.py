"""Cross-fold aggregation of pointwise confusion matrices.

CLI parity with reference learning/evaluate.py:20-59: sums pointwise_cm.npy
over cvfold directories, prints per-fold and overall OA / mAcc / mIoU and
per-class IoU (s3dis/vkitti).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from ..data.datasets import S3DIS_INV_CLASS_MAP, VKITTI_INV_CLASS_MAP
    from ..learn.metrics import ConfusionMatrix

    p = argparse.ArgumentParser(description="cross-fold result aggregation")
    p.add_argument("--odir", default="results/s3dis",
                   help="directory containing cv1..cv6 fold results")
    p.add_argument("--dataset", default="s3dis")
    p.add_argument("--cvfold", default="123456")
    args = p.parse_args(argv)

    inv_map = (
        VKITTI_INV_CLASS_MAP if args.dataset == "vkitti" else S3DIS_INV_CLASS_MAP
    )
    n_classes = len(inv_map)
    total = np.zeros((n_classes, n_classes))
    for fold in args.cvfold:
        path = os.path.join(args.odir, f"cv{fold}", "pointwise_cm.npy")
        if not os.path.isfile(path):
            print(f"fold {fold}: missing {path}")
            continue
        cm_arr = np.load(path)
        cm = ConfusionMatrix(n_classes)
        cm.confusion_matrix = cm_arr
        print(
            f"fold {fold}: OA {100 * cm.get_overall_accuracy():.2f} "
            f"mAcc {100 * cm.get_mean_class_accuracy():.2f} "
            f"mIoU {100 * cm.get_average_intersection_union():.2f}"
        )
        total += cm_arr

    cm = ConfusionMatrix(n_classes)
    cm.confusion_matrix = total
    print(
        f"overall: OA {100 * cm.get_overall_accuracy():.2f} "
        f"mAcc {100 * cm.get_mean_class_accuracy():.2f} "
        f"mIoU {100 * cm.get_average_intersection_union():.2f}"
    )
    for i, iou in enumerate(cm.get_intersection_union_per_class()):
        print(f"  {inv_map[i]:>14}: {100 * iou:.2f}")


if __name__ == "__main__":
    main()
