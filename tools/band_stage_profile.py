"""Micro-profile of the banded cut-pursuit solver's pieces on the real chip.

Times each jitted sub-computation of ops/cutpursuit_band._solve_band in
isolation at n_pad 2^19 with the production band geometry, so the round-4
kernel work attacks the measured cost, not the assumed one. Receipts to
tools/band_stage_profile_results.json.

Run: python tools/band_stage_profile.py [--n 500000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_spgt")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from superpoint_graph_tpu.data.synthetic import big_scene  # noqa: E402
from superpoint_graph_tpu.ops import cutpursuit_band as cpb  # noqa: E402
from superpoint_graph_tpu.ops.knn import knn  # noqa: E402


def sync(x):
    float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:8]))


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# --- jitted pieces (all operands are arguments — nothing band-sized may be
# closure-captured: jit bakes captured device arrays into the executable) ---


@partial(jax.jit, static_argnames=("nb",))
def build_same(comp, b, band_adj, *, nb):
    B = cpb.B
    compw = cpb.band_windows(comp, jnp.int32(-1))
    bw = cpb.band_windows(b.astype(jnp.int8), jnp.int8(-1))
    comp2 = comp.reshape(nb, B)[:, :, None]
    b2 = b.astype(jnp.int8).reshape(nb, B)[:, :, None]
    return band_adj & (compw[:, None, :] == comp2) & (bw[:, None, :] == b2)


@partial(jax.jit, static_argnames=("k",))
def cc_k(lab, same, *, k):
    return cpb.cc_band_sweeps(lab, same, k)


@partial(jax.jit, static_argnames=("n_pad",))
def hook_fn(lab, of_same, of_src, of_tgt, *, n_pad):
    m = jnp.where(of_same, jnp.minimum(lab[of_src], lab[of_tgt]), cpb.BIG)
    h = jnp.minimum(
        jax.ops.segment_min(m, of_src, num_segments=n_pad),
        jax.ops.segment_min(m, of_tgt, num_segments=n_pad),
    )
    return jnp.minimum(lab, h)


@jax.jit
def jump3(lab):
    return cpb._jump(lab, 3)


@partial(jax.jit, static_argnames=("n_pad", "sorted_ix"))
def hook_solver(lab, of_same, of_src, of_tgt, *, n_pad, sorted_ix=False):
    """The solver's actual one-sided hook (cc_full round_body)."""
    m = jnp.where(of_same, lab[of_tgt], cpb.BIG)
    h = jax.ops.segment_min(
        m, of_src, num_segments=n_pad, indices_are_sorted=sorted_ix
    )
    return jnp.minimum(lab, h)


@jax.jit
def carry10(lab):
    def body(s):
        l, i = s
        return jnp.minimum(l, l + 0), i + 1

    return jax.lax.while_loop(lambda s: s[1] < 10, body, (lab, 0))[0]


@partial(jax.jit, static_argnames=("nb",))
def build_wintra(comp, band_adj, band_w, *, nb):
    B = cpb.B
    compw = cpb.band_windows(comp, jnp.int32(-1))
    return jnp.where(
        band_adj & (compw[:, None, :] == comp.reshape(nb, B)[:, :, None]),
        band_w, jnp.bfloat16(0.0),
    )


@jax.jit
def icm1(w_intra, spin):
    bw = cpb.band_windows(spin, jnp.bfloat16(0.0))
    return jnp.einsum("pbw,pw->pb", w_intra, bw,
                      preferred_element_type=jnp.float32).reshape(-1)


@partial(jax.jit, static_argnames=("n_pad",))
def deltau_fn(b, f_p, comp, nw, *, n_pad):
    bf = b.astype(jnp.float32)
    hp, cp_ = cpb._seg_mean(f_p, comp, n_pad, nw * bf)
    hm, cm_ = cpb._seg_mean(f_p, comp, n_pad, nw * (1.0 - bf))
    return nw * (
        jnp.sum((f_p - hp[comp]) ** 2, axis=1)
        - jnp.sum((f_p - hm[comp]) ** 2, axis=1)
    )


@partial(jax.jit, static_argnames=("n_pad",))
def powerit(comp, f_p, nw, *, n_pad):
    mean, _ = cpb._seg_mean(f_p, comp, n_pad, nw)
    resid = f_p - mean[comp]
    d = f_p.shape[1]
    cov = jax.ops.segment_sum(
        (resid[:, :, None] * resid[:, None, :]).reshape(n_pad, d * d),
        comp, num_segments=n_pad,
    ).reshape(n_pad, d, d)
    v = jnp.ones((n_pad, d), jnp.float32)
    for _ in range(8):
        v = jnp.einsum("nij,nj->ni", cov, v)
        v = v * jax.lax.rsqrt(jnp.sum(v * v, axis=1, keepdims=True) + 1e-20)
    return jnp.sum(resid * v[comp], axis=1) > 0


@partial(jax.jit, static_argnames=("nb", "n_pad"))
def energy_fn(comp, f_p, nw, band_adj, band_w, of_src, of_tgt, of_w, *, nb,
              n_pad):
    B = cpb.B
    mean, _ = cpb._seg_mean(f_p, comp, n_pad, nw)
    fid = jnp.sum(nw * jnp.sum((f_p - mean[comp]) ** 2, axis=1))
    compw = cpb.band_windows(comp, jnp.int32(-1))
    cross_band = jnp.sum(
        jnp.where(
            band_adj & (compw[:, None, :] != comp.reshape(nb, B)[:, :, None]),
            band_w, jnp.bfloat16(0.0),
        ).astype(jnp.float32)
    )
    cross_of = jnp.sum(jnp.where(comp[of_src] != comp[of_tgt], of_w, 0.0))
    return fid + 0.5 * (cross_band + cross_of)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    B, WIN = cpb.B, cpb.WIN
    xyz = big_scene(args.n, seed=0)
    n = len(xyz)
    n_pad = 1 << int(np.ceil(np.log2(max(n, 1024))))
    nb = n_pad // B
    print(f"n={n} n_pad={n_pad} B={B} WIN={WIN} nb={nb}", flush=True)

    idx, d2 = knn(jnp.asarray(xyz, jnp.float32), args.k)
    idx = jnp.pad(idx, ((0, n_pad - n), (0, 0)))
    d2 = jnp.pad(d2, ((0, n_pad - n), (0, 0)))
    sync(d2)

    f_dev = jnp.pad(
        jnp.asarray(np.random.RandomState(0).rand(n, 4), jnp.float32),
        ((0, n_pad - n), (0, 0)),
    )

    perm = cpb.morton_order(xyz)
    perm_full = np.concatenate([perm, np.arange(n, n_pad)]).astype(np.int32)
    inv = np.empty(n_pad, np.int32)
    inv[perm_full] = np.arange(n_pad, dtype=np.int32)

    e_total = 2 * n_pad * args.k
    of_cap = max(4096, 1 << int(np.ceil(np.log2(max(e_total // 4, 2)))))
    (f_p, band_w, of_src, of_tgt, of_w, nw, of_count,
     of_unique) = cpb._prep_band_device(
        f_dev, idx, d2, jnp.asarray(perm_full), jnp.asarray(inv),
        jnp.int32(n), jnp.float32(1.0), k_adj=args.k, of_cap=of_cap,
    )
    of_n = int(jax.device_get(of_unique))
    cap2 = max(16384, 1 << int(np.ceil(np.log2(max(of_n, 2)))))
    if cap2 < of_cap:
        of_src, of_tgt, of_w = of_src[:cap2], of_tgt[:cap2], of_w[:cap2]
    sync(band_w[0, 0])
    res = {
        "n": n, "n_pad": n_pad, "B": B, "WIN": WIN, "k": args.k,
        "of_edges": of_n, "of_cap": cap2,
        "of_frac": round(of_n / (2 * n * args.k), 4),
        "band_gb": round(n_pad * WIN * 2 / 2**30, 3),
    }
    print("overflow edges:", of_n, f"({res['of_frac']:.1%})", "cap", cap2,
          flush=True)

    band_adj = (band_w > jnp.bfloat16(0)).block_until_ready()
    comp = jnp.asarray((np.arange(n_pad) // 97).astype(np.int32))
    b = jnp.asarray((np.random.RandomState(1).rand(n_pad) > 0.5))
    spin = (jnp.bfloat16(1.0) - jnp.bfloat16(2.0) * b.astype(jnp.bfloat16))
    iota = jnp.arange(n_pad, dtype=jnp.int32)

    def step(name, fn):
        fn()  # warm/compile
        res[name] = round(best_of(fn), 4)
        print(f"{name}: {res[name]}", flush=True)

    same = build_same(comp, b, band_adj, nb=nb)
    sync(same[0, 0])
    step("t_build_same_band",
         lambda: sync(build_same(comp, b, band_adj, nb=nb)[0, 0]))

    lab = cc_k(iota, same, k=4)
    sync(lab)
    step("t_cc_4sweeps", lambda: sync(cc_k(iota, same, k=4)))
    step("t_cc_1sweep", lambda: sync(cc_k(iota, same, k=1)))

    of_same = ((comp[of_src] == comp[of_tgt]) & (b[of_src] == b[of_tgt])
               & (of_w > 0.0)).block_until_ready()
    step("t_of_hook",
         lambda: sync(hook_fn(lab, of_same, of_src, of_tgt, n_pad=n_pad)))
    step("t_of_hook_solver",
         lambda: sync(hook_solver(lab, of_same, of_src, of_tgt,
                                  n_pad=n_pad)))
    step("t_of_hook_sorted",
         lambda: sync(hook_solver(lab, of_same, of_src, of_tgt,
                                  n_pad=n_pad, sorted_ix=True)))
    step("t_jump3", lambda: sync(jump3(lab)))
    step("t_carry10_trivial", lambda: sync(carry10(lab)))

    w_intra = build_wintra(comp, band_adj, band_w, nb=nb)
    sync(w_intra[0, 0])
    step("t_build_w_intra",
         lambda: sync(build_wintra(comp, band_adj, band_w, nb=nb)[0, 0]))
    step("t_icm_einsum", lambda: sync(icm1(w_intra, spin)))
    step("t_deltau", lambda: sync(deltau_fn(b, f_p, comp, nw, n_pad=n_pad)))
    step("t_cov_power", lambda: sync(powerit(comp, f_p, nw, n_pad=n_pad)))
    step("t_energy",
         lambda: sync(energy_fn(comp, f_p, nw, band_adj, band_w, of_src,
                                of_tgt, of_w, nb=nb, n_pad=n_pad)))

    def full():
        out = cpb._solve_band(
            f_p, band_w, of_src, of_tgt, of_w, nw,
            jnp.float32(0.03), jnp.float32(0.7),
        )
        sync(out[0])
        return out

    out = full()
    res["solve_iters"] = int(jax.device_get(out[2]))
    res["solve_cc_rounds"] = int(jax.device_get(out[3]))
    step("t_full_solve", full)

    it = res["solve_iters"]
    ccr = res["solve_cc_rounds"]
    est = (
        it * (res["t_build_same_band"] + res["t_build_w_intra"]
              + res["t_cov_power"] + res["t_energy"] + res["t_deltau"] * 2
              + res["t_icm_einsum"] * 12)
        + ccr * (res["t_cc_4sweeps"] + res["t_of_hook"] + res["t_jump3"])
        + (it + ccr) * res["t_carry10_trivial"] / 10
        + res["t_energy"]
    )
    res["t_estimated_from_pieces"] = round(est, 3)
    print("estimated:", res["t_estimated_from_pieces"], flush=True)

    out_path = args.out or os.path.join(
        os.path.dirname(__file__), "band_stage_profile_results.json"
    )
    with open(out_path, "w") as fh:
        json.dump(res, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
