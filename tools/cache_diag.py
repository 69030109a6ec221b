"""Diagnose persistent-compile-cache behavior for the big-path executables.

CLAUDE.md records "the persistent compile cache often misses across
processes for large executables" — the 11x cold-start (VERDICT r3 weak-#2)
hangs on this. This tool runs the SAME band-solve workload in two fresh
subprocesses with `jax_explain_cache_misses` logging, then reports per-stage
compile/run time of each pass and the cache-miss explanations, so the fix
targets the actual unstable key component.

Usage (real TPU): python tools/cache_diag.py [--n 500000]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = r"""
import json, logging, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_spgt")
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:
    jax.config.update("jax_explain_cache_misses", True)
except Exception:
    pass
logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    h = logging.StreamHandler(sys.stderr)
    h.setLevel(logging.DEBUG)
    lg.addHandler(h)

import numpy as np
import jax.numpy as jnp
from superpoint_graph_tpu.data.synthetic import big_scene
from superpoint_graph_tpu.ops import cutpursuit_band as cpb
from superpoint_graph_tpu.ops.geof import compute_geof_rows
from superpoint_graph_tpu.ops.knn import knn_bigcloud
from superpoint_graph_tpu.pipeline import _assemble_features_device

n_arg = {n}
stages = {{}}
t0 = time.perf_counter()
xyz = big_scene(n_arg)
n = len(xyz)
bi, bd2, _ = knn_bigcloud(xyz, 45)
idx_adj = bi[:, :10]
d2_adj = bd2[:, :10]
xyz_dev = jnp.asarray(xyz)
geof_dev = compute_geof_rows(xyz_dev, xyz_dev, bi)
rgb = jnp.asarray(np.full((n, 3), 127, np.uint8))
f_dev = _assemble_features_device(geof_dev, rgb)
float(jnp.sum(f_dev[:4, 0]))
stages["knn_geof"] = round(time.perf_counter() - t0, 1)

B = cpb.B
nb = -(-n // B)
nb_pad = 1 << int(np.ceil(np.log2(max(nb, 2))))
n_pad = nb_pad * B
f_dev = jnp.pad(f_dev, ((0, n_pad - n), (0, 0)))
idx_adj = jnp.pad(idx_adj, ((0, n_pad - n), (0, 0)))
d2_adj = jnp.pad(d2_adj, ((0, n_pad - n), (0, 0)))

t0 = time.perf_counter()
cpb.cutpursuit_band_device(f_dev, idx_adj, d2_adj, xyz, n, 0.1)
stages["solve_first"] = round(time.perf_counter() - t0, 1)
t0 = time.perf_counter()
cpb.cutpursuit_band_device(f_dev, idx_adj, d2_adj, xyz, n, 0.1)
stages["solve_warm"] = round(time.perf_counter() - t0, 1)
print("STAGES " + json.dumps(stages))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    args = ap.parse_args()

    code = WORKER.format(repo=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), n=args.n)
    out = {}
    for run in ("pass1", "pass2"):
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=3600)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("STAGES "):
                rec = json.loads(line[len("STAGES "):])
        misses = [ln for ln in p.stderr.splitlines()
                  if "miss" in ln.lower() or "cache" in ln.lower()]
        out[run] = {"stages": rec, "cache_log_tail": misses[-40:]}
        print(run, json.dumps(rec), flush=True)
        for ln in misses[-40:]:
            print("  ", ln[:300], flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cache_diag_results.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
