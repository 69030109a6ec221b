"""Streaming metrics — semantic confusion matrix + partition-quality measures.

Behavioral spec: reference learning/metrics.py. The confusion-matrix update
accumulates *soft* ground-truth histograms against hard predictions
(count_predicted_batch, metrics.py:16-18), mIoU averages over *seen* classes
only (metrics.py:67-70), mAcc divides by the total class count. The per-row
Python loops of the reference become vectorized scatter-adds.
"""
from __future__ import annotations

import numpy as np


class ConfusionMatrix:
    def __init__(self, number_of_labels: int = 2):
        self.number_of_labels = number_of_labels
        self.confusion_matrix = np.zeros(
            (number_of_labels, number_of_labels), dtype=np.float64
        )

    def count_predicted(self, ground_truth, predicted, n=1):
        self.confusion_matrix[ground_truth, predicted] += n

    def count_predicted_batch(self, ground_truth_vec, predicted):
        """ground_truth_vec [n, C] soft histograms, predicted [n] hard ids."""
        np.add.at(self.confusion_matrix.T, predicted, ground_truth_vec)

    def count_predicted_batch_hard(self, ground_truth_vec, predicted):
        np.add.at(self.confusion_matrix, (ground_truth_vec, predicted), 1)

    def get_count(self, ground_truth, predicted):
        return self.confusion_matrix[ground_truth, predicted]

    def get_confusion_matrix(self):
        return self.confusion_matrix

    def get_intersection_union_per_class(self):
        cm = self.confusion_matrix
        diag = np.diag(cm)
        divisor = cm.sum(0) + cm.sum(1) - diag
        divisor = np.where(diag == 0, 1.0, divisor)
        return (diag / divisor).tolist()

    def get_overall_accuracy(self):
        total = self.confusion_matrix.sum()
        return float(np.trace(self.confusion_matrix)) / max(total, 1.0)

    def get_average_intersection_union(self):
        values = self.get_intersection_union_per_class()
        seen = ((self.confusion_matrix.sum(1) + self.confusion_matrix.sum(0)) != 0).sum()
        return sum(values) / max(seen, 1)

    def get_mean_class_accuracy(self):
        cm = self.confusion_matrix
        per_class = np.diag(cm) / np.maximum(1, cm.sum(1))
        return float(per_class.sum()) / self.number_of_labels

    def count_gt(self, ground_truth):
        return self.confusion_matrix[ground_truth, :].sum()


def compute_predicted_transitions(in_component, edg_source, edg_target):
    return in_component[edg_source] != in_component[edg_target]


def compute_boundary_recall(is_transition, pred_transitions):
    return (
        100.0
        * ((is_transition == pred_transitions) * is_transition).sum()
        / is_transition.sum()
    )


def compute_boundary_precision(is_transition, pred_transitions):
    return (
        100.0
        * ((is_transition == pred_transitions) * pred_transitions).sum()
        / pred_transitions.sum()
    )


def mode(array, only_freq=False):
    value, counts = np.unique(array, return_counts=True)
    if only_freq:
        return np.amax(counts)
    return value[np.argmax(counts)], np.amax(counts)


def compute_OOA(components, labels):
    """Optimal attainable overall accuracy of a partition (metrics.py:102-108)."""
    hard = labels.argmax(1)
    correct = sum(mode(hard[comp], only_freq=True) for comp in components)
    return 100.0 * correct / len(labels)


def perfect_prediction(components, labels):
    """Majority-label oracle per component, upsampled to points
    (reference provider.py:689-695): `labels` is the (n, n_classes+1)
    histogram whose column 0 counts unlabeled points; the component label is
    the argmax over the class columns (0-based class ids)."""
    full_pred = np.zeros(labels.shape[0], dtype=np.int64)
    for comp in components:
        comp = np.asarray(comp, np.int64)
        if len(comp):
            full_pred[comp] = labels[comp, 1:].sum(0).argmax()
    return full_pred
