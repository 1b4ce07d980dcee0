"""Resume test (SURVEY.md §5 item 5): kill between stages, re-run,
assert identical final triples and that completed stages are skipped."""

import json
import os
import shutil

import pandas as pd
import pytest

from sociallink_ray.fixtures import build_corpus

CORPUS = "/tmp/slr_corpus_sf0.001"


@pytest.fixture(scope="module")
def corpus(ray_session):
    build_corpus(CORPUS, sf=0.001)
    return CORPUS


def _mtimes(work):
    out = {}
    for stage in ["parsed", "name_index", "user_text", "accounts", "features"]:
        p = os.path.join(work, stage, "_MANIFEST.json")
        if os.path.exists(p):
            out[stage] = os.path.getmtime(p)
    return out


def test_flagship_resume_after_partial_failure(corpus, ray_session, tmp_path):
    from sociallink_ray.pipelines.align import run_flagship_checkpointed

    work = str(tmp_path / "work")
    t1, _, w1 = run_flagship_checkpointed(corpus, work)
    full = t1.to_pandas()
    before = _mtimes(work)

    # simulate a crash after the feature stage: later stages lost
    shutil.rmtree(os.path.join(work, "selected"))
    shutil.rmtree(os.path.join(work, "triples"))

    t2, _, w2 = run_flagship_checkpointed(corpus, work)
    resumed = t2.to_pandas()
    after = _mtimes(work)

    # earlier stages were NOT recomputed (same manifest mtimes)...
    assert before == after
    # ...and the final triples are identical
    a = full.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = resumed.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["subj", "pred", "obj"]], b[["subj", "pred", "obj"]])
    assert w1 == w2  # weights reloaded, not retrained

    # manifests carry lineage metadata
    with open(os.path.join(work, "parsed", "_MANIFEST.json")) as f:
        m = json.load(f)
    assert m["complete"] and m["rows"] > 0 and "fingerprint" in m


def test_config_change_invalidates_downstream_only(corpus, ray_session, tmp_path):
    from sociallink_ray.pipelines.align import run_flagship_checkpointed

    work = str(tmp_path / "work2")
    run_flagship_checkpointed(corpus, work)
    before = _mtimes(work)
    # threshold change: selection/triples recompute, upstream untouched
    run_flagship_checkpointed(corpus, work, max_imp=0.2)
    after = _mtimes(work)
    assert before == after


def test_stale_weights_bundle_ignored(corpus, ray_session, tmp_path):
    """A weights.json persisted under older pipeline semantics (no _fp,
    no wemb — e.g. pre-v6) must be IGNORED, not half-reused: the old
    behavior retrained the wemb model on every invocation without ever
    persisting it, and scored a v6 feature table with stale cols."""
    from sociallink_ray.pipelines.align import run_flagship_checkpointed

    work = str(tmp_path / "work3")
    t1, _, w1 = run_flagship_checkpointed(corpus, work)
    wpath = os.path.join(work, "weights.json")
    with open(wpath) as f:
        saved = json.load(f)
    assert "_fp" in saved and "wemb" in saved

    # simulate the pre-v6 bundle
    stale = {k: v for k, v in saved.items() if k not in ("_fp", "wemb")}
    with open(wpath, "w") as f:
        json.dump(stale, f)

    t2, _, w2 = run_flagship_checkpointed(corpus, work)
    with open(wpath) as f:
        rewritten = json.load(f)
    # the stale file was ignored -> retrained AND re-persisted fresh
    assert rewritten.get("_fp") == saved["_fp"]
    assert "wemb" in rewritten
    # training is deterministic, so the fresh retrain reproduces run 1
    assert w1 == w2
    a = t1.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    b = t2.to_pandas().sort_values(["subj", "pred", "obj"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["subj", "pred", "obj"]], b[["subj", "pred", "obj"]]
    )
