"""Training/eval machinery: metrics, losses, schedules, checkpoints, trainer.

Reference parity: learning/main.py (driver), learning/metrics.py,
learning/evaluate.py.
"""
