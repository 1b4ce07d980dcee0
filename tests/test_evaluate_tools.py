"""MostFollowers baseline, per-sample debug dumps, and the distributed
grouped-JSON result sink (align-train/rule_based/most_followers.py,
align-train/evaluate.py:104-222, output/JSONResultWriter.java)."""

import numpy as np
import pandas as pd


def _cand_df():
    # 3 entities x candidates; f_followers is any monotone transform
    return pd.DataFrame(
        {
            "resource_id": ["e1", "e1", "e1", "e2", "e2", "e3"],
            "uid": [10, 11, 12, 20, 21, 30],
            "order": [0, 1, 2, 0, 1, 0],
            "screen_name": ["a", "b", "c", "d", "e", "f"],
            "f_followers": [2.0, 5.0, 1.0, 3.0, 3.0, 0.0],
            "score": [0.2, 0.9, 0.1, 0.7, 0.6, 0.3],
            "rank": [2, 1, 3, 1, 2, 1],
            "is_alignment": [False, True, False, True, False, False],
        }
    )


def test_most_followers_baseline_selection_and_pr():
    from sociallink_ray.pipelines.evaluate import (
        baseline_pr,
        evaluate_selection,
        most_followers_select,
    )

    df = _cand_df()
    sel = most_followers_select(df).set_index("resource_id")
    assert sel.loc["e1", "uid"] == 11  # max followers
    assert sel.loc["e2", "uid"] == 20  # tie -> earliest order (ref '>')
    assert sel.loc["e3", "uid"] == 30
    gold = pd.DataFrame({"resource_id": ["e1", "e2"], "uid": [11, 21]})
    ents = ["e1", "e2", "e3"]
    base = baseline_pr(df, gold, ents, joint=False)
    # e1 correct, e2 wrong (tie picked 20, gold 21), e3 fp (no gold)
    assert base.tp == 1 and base.fp == 2
    model = evaluate_selection(df, gold, ents, joint=False)
    assert model.precision > base.precision  # the baseline is a floor


def test_sample_dump_reference_format(tmp_path):
    from sociallink_ray.pipelines.evaluate import write_sample_dump

    df = _cand_df()
    gold = pd.DataFrame({"resource_id": ["e1", "e2"], "uid": [11, 21]})
    p = tmp_path / "model.dump"
    n = write_sample_dump(df, gold, str(p))
    assert n == 3
    lines = p.read_text().splitlines()
    # per entity: Entry + Query headers, then one line per candidate
    assert lines[0] == "Entry: e1" and lines[1] == "Query: -"
    c1 = lines[2].split("\t")
    assert len(c1) == 6
    assert float(c1[0]) + float(c1[1]) == 1.0  # (1-score, score)
    assert c1[1] == "0.200000" and c1[3] == "1"  # first-candidate flag
    # correct flag marks the gold uid row (uid=11, order 1 -> line 3)
    assert lines[3].split("\t")[2] == "1"
    # baseline form: indicator scores
    pb = tmp_path / "base.dump"
    write_sample_dump(df, gold, str(pb), score_col=None)
    blines = pb.read_text().splitlines()
    scores = {tuple(l.split("\t")[:2]) for l in blines if "\t" in l}
    assert scores <= {("1.000000", "0.000000"), ("0.000000", "1.000000")}


def test_grouped_json_sink_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from sociallink_ray.sources.jsonout import (
        grouped_records,
        read_grouped_json,
        write_grouped_json,
    )

    df = _cand_df()
    out = str(tmp_path / "gj")
    manifest = write_grouped_json(rd.from_pandas(df).repartition(3), out)
    assert manifest["rows"].sum() == 3
    got = read_grouped_json(out)
    want = sorted(grouped_records(df), key=lambda r: r["resource_id"])
    assert got == want
    assert got[0]["uid"] == 11  # e1's selected alignment
    assert got[2]["uid"] is None  # e3 has no alignment
    # pretty variant holds identical records
    outp = str(tmp_path / "gjp")
    write_grouped_json(rd.from_pandas(df), outp, pretty=True)
    assert read_grouped_json(outp) == want


def test_most_followers_raw_count_breaks_zero_one_tie():
    """f_followers maps 0 and 1 followers both to 0.0; the baseline
    must use the raw count so 1 follower beats 0 (reference strict >
    over raw counts)."""
    from sociallink_ray.pipelines.evaluate import most_followers_select

    df = pd.DataFrame(
        {
            "resource_id": ["e1", "e1"],
            "uid": [10, 20],
            "order": [0, 1],
            "followers_count": [0, 1],
            "f_followers": [0.0, 0.0],
        }
    )
    sel = most_followers_select(df).set_index("resource_id")
    assert sel.loc["e1", "uid"] == 20
