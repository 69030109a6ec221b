"""Diagnose persistent-compile-cache behavior for the big-path executables.

CLAUDE.md records "the persistent compile cache often misses across
processes for large executables" — the 11x cold-start (VERDICT r3 weak-#2)
hangs on this. Round-4 measurement (tools/cache_diag_results.json):
`_solve_band` DOES cache across processes (31.7 s -> 7.4 s), but the
kNN+geof stage kept ~200 s of residual cost in the second process. This
tool attributes that residual: it runs the same band-solve workload in
fresh subprocesses with `jax_explain_cache_misses`, aggregating per STAGE
(knn_geof / solve) the cache misses, the sub-threshold "not writing"
refusals (compiles jax refuses to cache because they took < min_compile_time
seconds), and their total compile seconds. A third pass runs with
min_compile_time_secs=0 so every executable caches — if the residual
vanishes there, the fix is lowering the threshold in utils/cache.py.

Usage (real TPU): python tools/cache_diag.py [--n 500000]
"""
from __future__ import annotations

import argparse
import json
import os
import re
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", {min_ct})
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
print("STAGE_MARK knn_geof", time.time(), file=sys.stderr, flush=True)
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

print("STAGE_MARK solve", time.time(), file=sys.stderr, flush=True)
t0 = time.perf_counter()
cpb.cutpursuit_band_device(f_dev, idx_adj, d2_adj, xyz, n, 0.1)
stages["solve_first"] = round(time.perf_counter() - t0, 1)
t0 = time.perf_counter()
cpb.cutpursuit_band_device(f_dev, idx_adj, d2_adj, xyz, n, 0.1)
stages["solve_warm"] = round(time.perf_counter() - t0, 1)
print("STAGES " + json.dumps(stages))
"""

RE_MISS = re.compile(r"CACHE MISS for '([^']+)'")
RE_REFUSE = re.compile(
    r"Not writing persistent cache entry for '([^']+)' because it took "
    r"< [\d.]+ seconds to compile \(([\d.]+)s\)"
)
RE_STAGE = re.compile(r"STAGE_MARK (\w+)")


def summarize(stderr: str) -> dict:
    """Aggregate per stage: miss counts per jit name, refused-compile counts
    and their total seconds."""
    stage = "startup"
    out: dict = {}

    def bucket():
        return out.setdefault(
            stage, {"miss": {}, "refused": {}, "refused_sec": 0.0}
        )

    for ln in stderr.splitlines():
        sm = RE_STAGE.search(ln)
        if sm:
            stage = sm.group(1)
            continue
        mm = RE_MISS.search(ln)
        if mm and "WARNING:jax" not in ln[:20]:
            b = bucket()
            b["miss"][mm.group(1)] = b["miss"].get(mm.group(1), 0) + 1
            continue
        rm = RE_REFUSE.search(ln)
        if rm and "WARNING:jax" not in ln[:20]:
            b = bucket()
            b["refused"][rm.group(1)] = b["refused"].get(rm.group(1), 0) + 1
            b["refused_sec"] = round(
                b["refused_sec"] + float(rm.group(2)), 1
            )
    # halve the double-logged counts (logger propagates to two handlers)
    for st in out.values():
        st["miss"] = {k: (v + 1) // 2 for k, v in st["miss"].items()}
        st["refused"] = {k: (v + 1) // 2 for k, v in st["refused"].items()}
        st["refused_sec"] = round(st["refused_sec"] / 2, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--passes", nargs="+",
                    default=["warm1.0", "warm1.0", "zero0.0"],
                    help="each entry: <label><min_compile_time>")
    args = ap.parse_args()

    out = {}
    for i, spec in enumerate(args.passes):
        m = re.match(r"([a-z]+)([\d.]+)", spec)
        label, min_ct = f"pass{i+1}_{m.group(1)}", float(m.group(2))
        code = WORKER.format(
            repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            n=args.n, min_ct=min_ct,
        )
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=3600)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("STAGES "):
                rec = json.loads(line[len("STAGES "):])
        out[label] = {"stages": rec, "summary": summarize(p.stderr)}
        print(label, json.dumps(rec), flush=True)
        print(json.dumps(out[label]["summary"], indent=1)[:2000], flush=True)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "cache_diag_results.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
