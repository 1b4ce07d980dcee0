"""Evaluation harness: the reference's CustomEvaluation truth table
(evaluation/CustomEvaluation.java:31-55), the (maxImp, minScore)
P/R grid (PrepareTrainingSet.java:936-1039), the MostFollowers
rule-based baseline (align-train/rule_based/most_followers.py:1-16)
and the per-sample evaluation debug dumps
(align-train/evaluate.py:104-222)."""

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


# --------------------------------------------------------------------------
# MostFollowers rule-based baseline + per-sample debug dumps
# --------------------------------------------------------------------------


def most_followers_select(
    cand_df: pd.DataFrame,
    followers_col: str = "followers_count",
    order_col: str = "order",
) -> pd.DataFrame:
    """The reference's rule-based evaluation floor
    (align-train/rule_based/most_followers.py:1-16): per entity, the
    candidate with the most followers IS the alignment; ties break to
    the earliest candidate ``order`` — the reference's strict ``>``
    loop keeps the first maximum it sees. Prefers the RAW
    ``followers_count`` the feature table carries: the log feature
    ``f_followers`` maps both 0 and 1 followers to 0.0 (the ``fol>0``
    gate), so it is NOT strictly monotone at the bottom and would
    mis-break that tie to candidate order. Falls back to
    ``f_followers`` (with that documented caveat) only when the raw
    column is absent."""
    if followers_col not in cand_df.columns and "f_followers" in cand_df.columns:
        followers_col = "f_followers"
    df = cand_df.sort_values(
        ["resource_id", followers_col, order_col],
        ascending=[True, False, True], kind="mergesort",
    )
    top = df.groupby("resource_id", sort=False).head(1).copy()
    top["is_alignment"] = True
    return top[["resource_id", "uid", "is_alignment"]]


def baseline_pr(
    cand_df: pd.DataFrame, gold_df: pd.DataFrame, all_entities: list[str],
    joint: bool = True, followers_col: str = "followers_count",
) -> PrecisionRecall:
    """P/R of the MostFollowers baseline — the evaluation floor the
    reference prints next to every model (evaluate.py:105-127). Report
    it alongside ``pr_grid`` so a trained scorer's lift is visible."""
    return evaluate_selection(
        most_followers_select(cand_df, followers_col=followers_col),
        gold_df, all_entities, joint=joint,
    )


def write_sample_dump(
    cand_df: pd.DataFrame,
    gold_df: pd.DataFrame,
    path: str,
    score_col: str | None = "score",
    order_col: str = "order",
) -> int:
    """Per-sample evaluation debug dump in the reference's format
    (align-train/evaluate.py:106-127 baseline / 146-195 model): per
    entity an ``Entry:``/``Query:`` header, then one tab-separated line
    per candidate: negative score, positive score, is-correct flag,
    is-first flag, gold account id, candidate screen name.

    ``score_col=None`` dumps the MostFollowers baseline's indicator
    scores (predicted candidate gets (0,1), the rest (1,0)) exactly
    like the reference's baseline block. With a score column, lines
    carry (1-score, score). Deviation: the reference keys gold by the
    entry's twitterId string; our gold table is (resource_id, uid), so
    the 5th column holds the gold uid (-1 when the entity has no gold
    account).

    This is operational debug tooling over the scored candidate table
    — bounded by |entities| x the per-entity candidate cap (the same
    bound as training), NOT corpus bytes, so a driver-side file write
    is the right shape even at 100 TB corpus scale. Returns the number
    of entities dumped."""
    gold = dict(zip(gold_df["resource_id"], gold_df["uid"]))
    df = cand_df.sort_values(
        ["resource_id", order_col], kind="mergesort"
    ).reset_index(drop=True)
    if score_col is None:
        pred = most_followers_select(df)
        pred_pairs = set(zip(pred["resource_id"], pred["uid"]))
    n = 0
    with open(path, "w") as w:
        for rid, g in df.groupby("resource_id", sort=False):
            n += 1
            w.write(f"Entry: {rid}\nQuery: -\n")
            guid = int(gold.get(rid, -1))
            first = True
            for row in g.itertuples(index=False):
                uid = int(row.uid)
                if score_col is None:
                    pos = 1.0 if (rid, uid) in pred_pairs else 0.0
                else:
                    pos = float(getattr(row, score_col))
                w.write(
                    "%.6f\t%.6f\t%d\t%d\t%s\t%s\n"
                    % (1.0 - pos, pos, int(uid == guid), int(first),
                       guid, row.screen_name)
                )
                first = False
    return n
