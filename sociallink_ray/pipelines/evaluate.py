"""Evaluation harness: the reference's CustomEvaluation truth table
(evaluation/CustomEvaluation.java:31-55) and the (maxImp, minScore)
P/R grid (PrepareTrainingSet.java:936-1039)."""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd


@dataclass
class PrecisionRecall:
    tp: int = 0
    fp: int = 0
    fn: int = 0

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def check(ev: PrecisionRecall, true_uid: int, predicted_uid: int, joint: bool = False):
    """One entity's contribution (CustomEvaluation.java:31-55):
    -1 encodes "no alignment"."""
    if true_uid == predicted_uid:
        if predicted_uid >= 0:
            ev.tp += 1
        elif joint:
            ev.fn += 1
    else:
        if predicted_uid >= 0:
            ev.fp += 1
            if joint or true_uid != -1:
                ev.fn += 1
        else:
            ev.fn += 1


def evaluate_selection(
    selected_df: pd.DataFrame, gold_df: pd.DataFrame, all_entities: list[str],
    joint: bool = True,
) -> PrecisionRecall:
    """Selected alignments (resource_id, uid, is_alignment) vs gold.
    Entities absent from gold have true=-1 (no true account)."""
    gold = dict(zip(gold_df["resource_id"], gold_df["uid"]))
    pred = dict(
        zip(
            selected_df.loc[selected_df["is_alignment"], "resource_id"],
            selected_df.loc[selected_df["is_alignment"], "uid"],
        )
    )
    ev = PrecisionRecall()
    for rid in all_entities:
        check(ev, int(gold.get(rid, -1)), int(pred.get(rid, -1)), joint=joint)
    return ev


def pr_grid(
    scored_df: pd.DataFrame, gold_df: pd.DataFrame, all_entities: list[str],
    max_imps=(0.0, 0.05, 0.1, 0.2, 0.3), min_scores=(0.5, 0.6, 0.7, 0.8, 0.9),
) -> pd.DataFrame:
    """Grid-search selection thresholds like the reference's evaluate()
    (gridImp x gridScore loops). ``scored_df`` must contain
    (resource_id, uid, score)."""
    rows = []
    by_ent = {
        rid: g.sort_values(["score", "uid"], ascending=[False, True])
        for rid, g in scored_df.groupby("resource_id", sort=False)
    }
    gold = dict(zip(gold_df["resource_id"], gold_df["uid"]))
    for mi in max_imps:
        for ms in min_scores:
            ev = PrecisionRecall()
            for rid in all_entities:
                g = by_ent.get(rid)
                pred = -1
                if g is not None and len(g):
                    pos = g.loc[g["score"] >= 0.5, ["uid", "score"]].to_numpy()
                    if len(pos):
                        best = float(pos[0][1])
                        second = float(pos[1][1]) if len(pos) > 1 else -1.0
                        if (best - second) > mi and best > ms:
                            pred = int(pos[0][0])
                check(ev, int(gold.get(rid, -1)), pred, joint=True)
            rows.append(
                {
                    "max_imp": mi, "min_score": ms,
                    "precision": ev.precision, "recall": ev.recall, "f1": ev.f1,
                }
            )
    return pd.DataFrame(rows)
