"""r8 experiment: recall-vs-n decay of the shipped multi-probe point.

The (m=3, P=24, K=ceil(sqrt(n))) operating point meets the 0.8 gate at
50k — but recall at FIXED (m, P) decays slowly as the corpus grows
(more cells, each probe covers less of the space). This study
quantifies the decay on hash-random vectors so the P-growth rule a
1M+ deployment needs is a measured curve, not a guess. Pure numpy
against exact ground truth (same seeded-stride centroid rule as the
shipped op).

Usage: python data/exp_recall_decay_r8.py  (writes exp_recall_decay_r8.json)
"""
from __future__ import annotations

import json
import math
import os
import time

import duckdb
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "exp_recall_decay_r8.json")
SRC = os.path.join(os.path.dirname(__file__), "gen", "sf2", "embeddings.parquet")
K_NN, M_IDX, P_PROBE = 3, 3, 24


def exact_topk(Vn: np.ndarray, k: int) -> np.ndarray:
    n = Vn.shape[0]
    topk = np.empty((n, k), dtype=np.int64)
    B = 4096
    for s in range(0, n, B):
        e = min(s + B, n)
        S = Vn[s:e] @ Vn.T
        for i in range(s, e):
            S[i - s, i] = -2.0
        idx = np.argpartition(-S, k, axis=1)[:, :k]
        rows = np.arange(e - s)[:, None]
        order = np.argsort(-S[rows, idx], axis=1)
        topk[s:e] = idx[rows, order]
    return topk


def point(ids: np.ndarray, Vn: np.ndarray, m: int, p: int) -> dict:
    n = Vn.shape[0]
    t0 = time.time()
    topk = exact_topk(Vn, K_NN)
    t_exact = time.time() - t0
    kbudget = max(32, math.ceil(math.sqrt(n)))
    stride = max(1, -(-n // kbudget))
    c_idx = np.where((ids % stride) == 0)[0]
    C = Vn[c_idx]
    sims = Vn @ C.T
    order = np.argsort(-sims, axis=1)
    Kc = len(c_idx)
    probe_mask = np.zeros((n, Kc), dtype=bool)
    probe_mask[np.arange(n)[:, None], order[:, :p]] = True
    hit = np.zeros((n, K_NN), dtype=bool)
    for j in range(m):
        hit |= probe_mask[np.arange(n)[:, None], order[:, j][topk]]
    n_index = np.zeros(Kc)
    n_probe = np.zeros(Kc)
    for j in range(m):
        np.add.at(n_index, order[:, j], 1)
    for j in range(p):
        np.add.at(n_probe, order[:, j], 1)
    pairs = float((n_index * n_probe).sum())
    return {
        "n": n,
        "k_cells": Kc,
        "recall": round(float(hit.mean()), 4),
        "pairs_ratio_vs_exact": round(pairs / (float(n) * n), 4),
        "exact_gt_secs": round(t_exact, 1),
    }


def main() -> None:
    tbl = duckdb.sql(
        f"select vec_id, embedding from '{SRC}/*.parquet' order by vec_id"
        if os.path.isdir(SRC)
        else f"select vec_id, embedding from '{SRC}' order by vec_id"
    ).fetchnumpy()
    ids_all = tbl["vec_id"]
    V = np.stack(tbl["embedding"]).astype(np.float64)
    Vn_all = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = {
        "metric": "multiprobe_recall_vs_n",
        "design": f"m={M_IDX} idx cells, P={P_PROBE} probes, K=ceil(sqrt(n))",
        "points": [],
    }
    for n in (10_000, 20_000, 50_000, 100_000):
        row = point(ids_all[:n], Vn_all[:n], M_IDX, P_PROBE)
        out["points"].append(row)
        print(row)
    # the P-growth rule: what P holds recall ~0.86 at 100k?
    for p in (32, 40):
        row = point(ids_all[:100_000], Vn_all[:100_000], M_IDX, p)
        row["p_probe"] = p
        out.setdefault("p_growth_100k", []).append(row)
        print("P =", p, row)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
