#!/usr/bin/env python
"""Per-cluster local crossmodal maps: the VERDICT r8 #4 experiment.

r8 proved 0.288 recall@10 is the closed-form ridge ceiling of ANY global
linear map at the 256-dim hashed-BOW features (SCALE.md §r8). The only
remaining lever is the FEATURES — here, piecewise linearity: route each
doc by a published deterministic clustering and train one
diagonally-whitened map per cell (per-cell X centering stats, per-cell
D whitening, GLOBAL y-centering so predictions stay comparable across
the whole candidate corpus). The moments stay abelian per-cell sums, so
the streaming maintainer generalizes unchanged.

Measurement harness: same full-paired-panel methodology as the r8
ceiling experiment (every paired doc is a query; ground truth =
self-retrieval of its own media rendering among ALL media candidates;
recall@{1,5,10} + MRR). Extraction is the engine's own exact-int
tables; the per-cell solve runs in numpy doubles (measurement only —
a productionized winner keeps the exact-int discipline).

Routings compared at sf0.01:
  global          — the r8 baseline (must reproduce ~0.288 r@10)
  kmeans{4,8,16}  — Lloyd cells over the corpus's own 64-dim hashed
                    embeddings (the published `_kmeans_fit` quantizer)
  lenq4           — text-length quartiles (media bucket means segment by
                    length, so the x→y relationship plausibly bends with
                    doc length)

Run: python scripts/xmodal_local_experiment.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from spark_deal_observer_spark.multimodal.crossmodal import (
        XMODAL_DIM,
        XMODAL_TEXT_DIM,
        _centered_media,
        _text_rows,
    )
    from spark_deal_observer_spark.operators.ranking import hashed_doc_embeddings
    from spark_deal_observer_spark.operators.similarity import _kmeans_fit
    from spark_deal_observer_spark.session import get_spark
    from spark_deal_observer_spark.sources.tables import load_table

    spark = get_spark("xmodal-local")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    ycn_all, _ = _centered_media(docs)
    y_rows = ycn_all.collect()
    paired = sorted({r.doc_id for r in y_rows})
    pidx = {d: k for k, d in enumerate(paired)}
    n = len(paired)
    Y = np.zeros((n, XMODAL_DIM))
    for r in y_rows:
        Y[pidx[r.doc_id], r.j] = r.ycn

    x_rows = _text_rows(docs).collect()
    by_doc: dict[int, list] = defaultdict(list)
    for r in x_rows:
        by_doc[r.doc_id].append((r.i, r.xi))
    X = np.zeros((n, XMODAL_TEXT_DIM))
    for d, comps in by_doc.items():
        if d in pidx:
            for i, xi in comps:
                X[pidx[d], i] = xi

    routings: dict[str, np.ndarray] = {"global": np.zeros(n, dtype=int)}

    vecs = hashed_doc_embeddings(docs).selectExpr("doc_id AS vec_id", "embedding")
    for k in (4, 8, 16):
        _, assigned = _kmeans_fit(vecs, k, 2)
        cells = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
        routings[f"kmeans{k}"] = np.array([cells.get(d, 0) for d in paired])

    lens = {
        r.doc_id: r.L
        for r in docs.select("doc_id", F.length("text").alias("L")).collect()
    }
    lvals = np.array([lens[d] for d in paired])
    qs = np.quantile(lvals, [0.25, 0.5, 0.75])
    routings["lenq4"] = np.searchsorted(qs, lvals)
    # the production candidate: FIXED cuts (ingest-time-stable routing is
    # what keeps the per-cell moments abelian for the streaming
    # maintainer; media-doc length quartiles measured ~185/305/420 at
    # every SF, so fixed cuts stay balanced)
    routings["lencut4"] = (
        (lvals > 192).astype(int) + (lvals > 304) + (lvals > 420)
    )

    def evaluate(cells: np.ndarray, train_mask: np.ndarray, eval_mask: np.ndarray) -> dict:
        """Train per-cell maps on `train_mask` docs; rank every eval query
        against ALL media candidates. train_mask == eval_mask reproduces
        the r8 in-sample methodology; disjoint masks measure the held-out
        generalization that separates real lift from memorization."""
        P = np.zeros((n, XMODAL_DIM))
        fitted = np.zeros(n, dtype=bool)
        for c in np.unique(cells):
            m = cells == c
            tr = m & train_mask
            if not tr.any():
                continue  # cell with no training docs: queries stay unfitted
            Xc = X[tr]
            num = Xc.T @ Y[tr]                     # (TEXT_DIM, DIM)
            den = (Xc * Xc).sum(axis=0)            # (TEXT_DIM,)
            W = np.divide(
                num, den[:, None], out=np.zeros_like(num), where=den[:, None] != 0
            )
            # query centering with the CELL's TRAIN stats (mirrors the
            # global pipeline's m·x − Σx trick; scale cancels in cosine)
            Xq = Xc.shape[0] * X[m] - Xc.sum(axis=0)[None, :]
            P[m] = Xq @ W
            fitted[m] = True
        pn = np.linalg.norm(P, axis=1, keepdims=True)
        yn = np.linalg.norm(Y, axis=1, keepdims=True)
        cos = (P / np.where(pn == 0, 1, pn)) @ (Y / np.where(yn == 0, 1, yn)).T
        ev = np.where(eval_mask & fitted)[0]
        order = np.argsort(-cos[ev], axis=1, kind="stable")
        self_rank = np.array(
            [int(np.where(order[k] == q)[0][0]) + 1 for k, q in enumerate(ev)]
        )
        return {
            "r_at_1": round(float((self_rank <= 1).mean()), 4),
            "r_at_5": round(float((self_rank <= 5).mean()), 4),
            "r_at_10": round(float((self_rank <= 10).mean()), 4),
            "mrr": round(float((1.0 / self_rank).mean()), 4),
            "n_eval": int(len(ev)),
            "n_cells": int(len(np.unique(cells))),
            "min_cell": int(np.bincount(cells).min()),
        }

    all_mask = np.ones(n, dtype=bool)
    ids = np.array(paired)
    holdout_train = ids % 2 == 0
    holdout_eval = ~holdout_train
    out = {"sf_dir": sf_dir, "n_panel": n, "routings": {}}
    for name, cells in routings.items():
        out["routings"][name] = {
            "in_sample": evaluate(cells, all_mask, all_mask),
            "holdout": evaluate(cells, holdout_train, holdout_eval),
        }
        print(name, json.dumps(out["routings"][name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
