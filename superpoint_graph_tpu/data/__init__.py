"""Datasets: readers, h5 cache builders, loaders, synthetic generators.

Reference parity: partition/provider.py (readers/writers),
learning/{s3dis,sema3d,vkitti,custom}_dataset.py (adapters + preprocessing),
learning/spg.py (SPG loading, augmentation, superpoint sampling, collation).
"""
