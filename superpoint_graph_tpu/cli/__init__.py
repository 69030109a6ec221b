"""Command-line entry points mirroring the reference CLI surfaces:

  python -m superpoint_graph_tpu.cli.partition  (partition/partition.py)
  python -m superpoint_graph_tpu.cli.train      (learning/main.py)
  python -m superpoint_graph_tpu.cli.visualize  (partition/visualize.py)
  python -m superpoint_graph_tpu.cli.evaluate   (learning/evaluate.py)
  python -m superpoint_graph_tpu.cli.ssp_preprocess (supervized_partition/graph_processing.py)
  python -m superpoint_graph_tpu.cli.ssp_train  (supervized_partition/supervized_partition.py)
  python -m superpoint_graph_tpu.cli.ssp_generate (supervized_partition/generate_partition.py)
  python -m superpoint_graph_tpu.cli.ssp_evaluate (supervized_partition/evaluate_partition.py)
"""
