"""CLI entry points (the ``ray job submit`` surface of the north rule).

    python -m sociallink_ray.cli align   --sf 0.001 [--out DIR] [--no-dedup]
    python -m sociallink_ray.cli corpus  --sf 0.01  [--dir DIR]
    python -m sociallink_ray.cli query   --name q1_pricing_summary --sf-dir DIR

Scripts own the Ray session (guarded init; the driver-facing
__ray_entry__ module never initializes Ray itself).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_align(args) -> int:
    ray = _ray_init()
    from .fixtures import corpus_dir_for
    from .pipelines.align import run_flagship
    from .sources.rdf import render_ntriples_sample

    corpus = args.corpus or corpus_dir_for(args.sf)
    out = args.out or os.path.join("/tmp/slr_out", f"align_sf{args.sf}")
    t0 = time.time()
    if args.checkpointed:
        from .pipelines.align import run_flagship_checkpointed

        triples, selected, weights = run_flagship_checkpointed(
            corpus, os.path.join(out, "work"), near_dedup=not args.no_dedup,
            kfold=args.kfold, scorer=args.scorer,
        )
    else:
        triples, selected, weights = run_flagship(
            corpus, near_dedup=not args.no_dedup, kfold=args.kfold,
            scorer=args.scorer,
        )
    os.makedirs(out, exist_ok=True)
    # triples as partitioned parquet (primary sink)
    triples.write_parquet(os.path.join(out, "triples"))
    # NTriples rendering (S9)
    from .sources.rdf import write_ntriples

    write_ntriples(triples, os.path.join(out, "ntriples"))
    # result dumps (S10: per-resource grouped JSON + flat CSV;
    # JSONResultWriter / PrettyJSONResultWriter / CSVResultWriter).
    # The grouped JSON is a distributed per-task gzip sink — one
    # resource-bucketed exchange, no driver loop.
    from .sources.jsonout import write_grouped_json

    # S10 flat-CSV sink: streamed per-task via write_csv (a directory of
    # CSV parts, like every other sink) — at the north star's 10^12-doc
    # scale the selection table is itself huge; never to_pandas it here
    selected.select_columns(
        ["resource_id", "uid", "score", "rank", "is_alignment"]
    ).write_csv(os.path.join(out, "alignments_csv"))
    write_grouped_json(
        selected, os.path.join(out, "alignments_json"), pretty=args.pretty_json
    )
    if args.svm_dump:
        # S11: libsvm-format feature dump of the scored candidate table
        from .pipelines.align import FEATURE_COLS
        from .sources.svm import write_svm

        write_svm(
            selected, os.path.join(out, "features_svm"),
            label_col="resource_id", feature_cols=FEATURE_COLS,
        )
    n = triples.count()
    from .stages.ops import quick_col_sum

    n_align, _ = quick_col_sum(
        selected.select_columns(["is_alignment"]).materialize(),
        "is_alignment",
    )
    print(
        json.dumps(
            {
                "corpus": corpus,
                "out": out,
                "triples": n,
                "alignments": int(n_align),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    print(render_ntriples_sample(triples, 5))
    ray.shutdown()
    return 0


def cmd_evaluate(args) -> int:
    """The reference's standalone evaluation tool
    (align-train/evaluate.py:100-222): run the flagship on a fixture
    corpus with gold, then dump the MostFollowers baseline P/R, the
    model's threshold P/R grid, and the two per-sample debug dumps
    (most_followers.dump / model.dump) side by side."""
    import pyarrow.parquet as pq

    ray = _ray_init()
    from .fixtures import corpus_dir_for
    from .pipelines.align import run_flagship
    from .pipelines.evaluate import (
        baseline_pr,
        evaluate_selection,
        pr_grid,
        write_sample_dump,
    )

    corpus = args.corpus or corpus_dir_for(args.sf)
    out = args.out or os.path.join("/tmp/slr_out", f"eval_sf{args.sf}")
    os.makedirs(out, exist_ok=True)
    t0 = time.time()
    _, selected, _ = run_flagship(corpus, kfold=args.kfold)
    # The P/R evaluators are driver-side pandas over the scored
    # candidate table joined to fixture gold — bounded by |entities| x
    # candidate cap, not corpus bytes.  Still prune to the columns the
    # evaluators touch before pulling (the selection table carries the
    # full feature vector otherwise).
    eval_cols = [
        c for c in (
            "resource_id", "uid", "score", "rank", "order",
            "is_alignment", "followers_count", "f_followers",
            "screen_name",
        ) if c in selected.schema().names
    ]
    sel_df = selected.select_columns(eval_cols).to_pandas()
    gold = pq.read_table(os.path.join(corpus, "gold.parquet")).to_pandas()
    ents = (
        pq.read_table(
            os.path.join(corpus, "kb_entities.parquet"),
            columns=["resource_id"],
        )
        .to_pandas()["resource_id"]
        .tolist()
    )
    base = baseline_pr(sel_df, gold, ents, joint=False)
    model = evaluate_selection(sel_df, gold, ents, joint=False)
    grid = pr_grid(sel_df, gold, ents)
    grid.to_csv(os.path.join(out, "pr_grid.csv"), index=False)
    write_sample_dump(
        sel_df, gold, os.path.join(out, "most_followers.dump"), score_col=None
    )
    write_sample_dump(sel_df, gold, os.path.join(out, "model.dump"))
    print(
        json.dumps(
            {
                "corpus": corpus,
                "out": out,
                "entities": len(ents),
                "baseline_most_followers": {
                    "precision": round(base.precision, 4),
                    "recall": round(base.recall, 4),
                    "f1": round(base.f1, 4),
                },
                "model": {
                    "precision": round(model.precision, 4),
                    "recall": round(model.recall, 4),
                    "f1": round(model.f1, 4),
                },
                "grid_best_f1": round(float(grid["f1"].max()), 4),
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_corpus(args) -> int:
    from .fixtures import build_corpus

    d = args.dir or f"/tmp/slr_corpus_sf{args.sf}"
    print(json.dumps(build_corpus(d, sf=args.sf)))
    return 0


def cmd_query(args) -> int:
    ray = _ray_init()
    from .queries import QUERIES

    t0 = time.time()
    res = QUERIES[args.name](args.sf_dir)
    import ray.data as rd

    df = res.to_pandas() if isinstance(res, rd.Dataset) else res
    print(df.head(20).to_string())
    print(f"rows={len(df)} wall={time.time() - t0:.2f}s")
    if args.stats and isinstance(res, rd.Dataset):
        # per-stage wall/cpu/rows from the streaming executor — the
        # "is wall-time dominated by useful compute" feedback loop
        print(res.stats())
    ray.shutdown()
    return 0


def cmd_align_one(args) -> int:
    """Single-entity alignment (the reference's SMT service entry
    point as a CLI verb): ranked candidates + emitted triples for ONE
    entity, served from the checkpointed batch artifacts."""
    ray = _ray_init()
    from .fixtures import corpus_dir_for
    from .pipelines.align import align_one

    corpus = args.corpus or corpus_dir_for(args.sf)
    work = args.work or os.path.join(
        "/tmp/slr_out", f"align_one_sf{args.sf}", "work"
    )
    ranked, triples = align_one(
        corpus, work, resource_id=args.resource_id,
        attributes_json=args.attributes_json,
        max_imp=args.max_imp, min_score=args.min_score,
        scorer=args.scorer,
    )
    out = {
        "resource_id": args.resource_id,
        "candidates": [
            {
                "uid": int(r["uid"]),
                "rank": int(r["rank"]),
                "score": round(float(r["score"]), 6),
                "is_alignment": bool(r["is_alignment"]),
            }
            for _, r in ranked.iterrows()
        ],
        "triples": [
            {"subj": t["subj"], "pred": t["pred"], "obj": str(t["obj"])}
            for _, t in triples.iterrows()
        ],
    }
    print(json.dumps(out, indent=2))
    ray.shutdown()
    return 0


def cmd_curate(args) -> int:
    """Documents -> curated, packed, hash-sharded training export: the
    end-to-end LLM corpus-prep surface (quality filter -> benchmark
    decontamination -> exact dedup -> sequence packing ->
    ``shard=<s>``-partitioned parquet)."""
    import numpy as np
    import pyarrow as pa

    ray = _ray_init()
    import ray.data as rd

    from .stages import curate

    t0 = time.time()
    ds = rd.read_parquet(
        f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def keep_bench(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % args.bench_mod == 0))

    bench = ds.map_batches(keep_bench, batch_format="pyarrow").take_all()
    grams_ref = ray.put(
        curate.build_benchmark_gram_hashes(
            [r["text"] for r in bench], args.ngram
        )
    )

    def keep_train(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % args.bench_mod != 0))

    train = ds.map_batches(keep_train, batch_format="pyarrow")
    if args.max_bits:
        # CCNet-style quality gate: drop docs whose avg bigram
        # information content under the reference-slice LM exceeds
        # the threshold (the LM trains on the same held-out slice the
        # decontamination grams come from); fused into the streaming
        # map — no driver id collection
        bench_ds = ds.map_batches(keep_bench, batch_format="pyarrow")
        lm_ref = ray.put(curate.train_bigram_lm(bench_ds, "text"))
        train = curate.lm_perplexity_gate(
            train, lm_ref, "text", "doc_id", args.max_bits
        )
    if args.fuzzy_decontam:
        # NEAR-duplicate eval contamination (paraphrase/whitespace
        # drift the exact n-gram pass misses): cross-table LSH join +
        # exchange-verified exact Jaccard; only the contaminated id
        # set (bounded by the true contamination rate) reaches the
        # driver, broadcast back as a sorted int64 drop set
        from .stages import dedup as _dedup

        bench_ds = ds.map_batches(keep_bench, batch_format="pyarrow")
        pairs = _dedup.fuzzy_decontaminate_pairs(
            train, bench_ds, "doc_id", "text", "doc_id", "text",
            threshold=args.fuzzy_decontam,
        ).to_pandas()
        import numpy as _np

        drop_ref = ray.put(
            _np.sort(pairs["a"].to_numpy(_np.int64))
            if len(pairs) else _np.empty(0, _np.int64)
        )
        from .stages import ops as _ops

        train = train.map_batches(
            _ops.id_drop_filter(drop_ref, "doc_id"), batch_format="pyarrow"
        )
    if args.substring_cut:
        from .stages import dedup as _dedup

        train = _dedup.substring_dedup_cut(
            train, "text", "doc_id", min_tokens=args.substring_cut
        ).drop_columns(["cut_tokens"])
    if args.dsir_keep:
        # DSIR selection: score every train doc by the unigram
        # log-likelihood ratio against the held-out reference slice;
        # the keep threshold is ONE t-digest scalar (shuffle-free), the
        # selection itself is an exchange semi-join on doc_id — the
        # kept-id set never collects on the driver
        from .stages import ops as _ops

        scores = curate.dsir_scores(
            ds, "text", "doc_id", target_mod=args.bench_mod
        ).materialize()
        thresh = _ops.approx_quantiles(
            scores, "log_weight", [1.0 - args.dsir_keep]
        )[0]
        kept = scores.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t["log_weight"], pa.scalar(thresh))
            ).select(["doc_id"]),
            batch_format="pyarrow",
        )
        train = _ops.exchange_join(train, kept, on=["doc_id"])
    if args.quality_gate:
        # model-based quality gate: LR trained distributed on the
        # reference slice vs the rest; docs clearing the score
        # threshold keep their rows via the same exchange semi-join
        from .stages import ops as _ops

        qs = curate.quality_classifier(
            ds, "text", "doc_id", target_mod=args.bench_mod
        )
        good = qs.map_batches(
            lambda t: t.filter(
                pa.compute.and_(
                    pa.compute.greater_equal(
                        t["score"], pa.scalar(args.quality_gate)
                    ),
                    pa.compute.equal(t["label"], pa.scalar(0)),
                )
            ).select(["doc_id"]),
            batch_format="pyarrow",
        )
        train = _ops.exchange_join(train, good, on=["doc_id"])
    if args.tfrecord:
        # the TFRecord export re-reads train for the text join —
        # materialize once so the gate chain (perplexity / decontam /
        # substring-cut / DSIR / quality) is not replayed a second time
        train = train.materialize()
    packed = curate.curate_corpus(
        train, grams_ref, "text", "doc_id",
        min_tokens=args.min_tokens, n=args.ngram, budget=args.budget,
    )
    out = args.out or "/tmp/slr_out/curated"
    curate.export_shards(packed, out, "doc_id", n_shards=args.shards)
    if args.tfrecord:
        from .stages import ops as _ops

        # packed carries only ids + packing offsets (text never travels
        # through the prefix scan); join the text back for the export
        texted = _ops.exchange_join(
            packed,
            train.select_columns(["doc_id", "text"]),
            on=["doc_id"],
        )
        curate.export_tfrecord_shards(
            texted, out + "_tfrecord", "doc_id", "text",
            n_shards=args.shards,
            extra_int_cols=["n_tokens", "start_tok", "seq_first", "seq_last"],
        )
    # scalar metrics only: prune to the one needed column and sum it
    # per-block (ops.quick_col_sum) — never pull the curated corpus
    # (with `text`) onto the driver just to report token totals
    from .stages.ops import quick_col_sum

    kept = rd.read_parquet(out, columns=["n_tokens"]).materialize()
    n_tok, n_docs = quick_col_sum(kept, "n_tokens")
    n_tok = int(n_tok)
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "out": out,
                "kept_docs": n_docs,
                "total_tokens": n_tok,
                "sequences": (n_tok + args.budget - 1) // args.budget,
                "shards": args.shards,
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="sociallink_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("align", help="run the flagship pages->triples pipeline")
    a.add_argument("--sf", type=float, default=0.001)
    a.add_argument("--corpus", default=None)
    a.add_argument("--out", default=None)
    a.add_argument("--no-dedup", action="store_true")
    a.add_argument("--checkpointed", action="store_true",
                   help="persist per-stage checkpoints and resume")
    a.add_argument("--scorer", default="pairwise",
                   choices=["pairwise", "listwise", "mlp"],
                   help="scorer family: pairwise IRLS LR (default), "
                        "listwise softmax, or the reference-architecture "
                        "MLP ensemble")
    a.add_argument("--kfold", type=int, default=None,
                   help="train a k-fold model ensemble (averaged serving)")
    a.add_argument("--svm-dump", action="store_true",
                   help="also dump the feature table in libsvm format")
    a.add_argument("--pretty-json", action="store_true",
                   help="pretty-print the grouped JSON dump "
                        "(PrettyJSONResultWriter)")
    a.set_defaults(fn=cmd_align)

    e = sub.add_parser(
        "evaluate",
        help="baseline + model P/R, threshold grid, per-sample dumps",
    )
    e.add_argument("--sf", type=float, default=0.001)
    e.add_argument("--corpus", default=None)
    e.add_argument("--out", default=None)
    e.add_argument("--kfold", type=int, default=None)
    e.set_defaults(fn=cmd_evaluate)

    c = sub.add_parser("corpus", help="generate the synthetic corpus")
    c.add_argument("--sf", type=float, default=0.001)
    c.add_argument("--dir", default=None)
    c.set_defaults(fn=cmd_corpus)

    ao = sub.add_parser(
        "align-one",
        help="rank candidates + emit triples for a single entity "
             "(SMT service analogue; serves from checkpointed stages)",
    )
    ao.add_argument("--sf", type=float, default=0.001)
    ao.add_argument("--corpus", default=None)
    ao.add_argument("--work", default=None,
                    help="checkpoint work dir (built on first call)")
    ao.add_argument("--resource-id", required=True)
    ao.add_argument("--attributes-json", default=None,
                    help="score an ad-hoc entity absent from the KB "
                         "(JSON attribute blob in kb_entities format)")
    ao.add_argument("--max-imp", type=float, default=0.0)
    ao.add_argument("--min-score", type=float, default=0.5)
    ao.add_argument("--scorer", default="pairwise",
                    choices=["pairwise", "listwise", "mlp"],
                    help="must match the work dir's batch run")
    ao.set_defaults(fn=cmd_align_one)

    q = sub.add_parser("query", help="run one catalog query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--stats", action="store_true",
                   help="print ds.stats() per-stage timing after the run")
    q.set_defaults(fn=cmd_query)

    cu = sub.add_parser(
        "curate", help="curate + pack + shard-export the documents corpus"
    )
    cu.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    cu.add_argument("--out", default=None)
    cu.add_argument("--min-tokens", type=int, default=25)
    cu.add_argument("--ngram", type=int, default=3)
    cu.add_argument("--budget", type=int, default=2048)
    cu.add_argument("--shards", type=int, default=16)
    cu.add_argument("--bench-mod", type=int, default=97)
    cu.add_argument("--tfrecord", action="store_true",
                    help="also export hash-sharded TFRecord files of "
                         "TF Examples (hand-rolled wire encoder)")
    cu.add_argument("--fuzzy-decontam", type=float, default=0.0, metavar="J",
                    help="drop train docs whose shingle-Jaccard vs any "
                         "benchmark doc reaches J (cross-table LSH join; "
                         "0 = off)")
    cu.add_argument("--substring-cut", type=int, default=0, metavar="L",
                    help="also cut exact duplicated substrings >= L "
                         "tokens before packing (0 = off)")
    cu.add_argument("--max-bits", type=float, default=0.0, metavar="B",
                    help="drop docs whose avg bigram bits under the "
                         "reference-slice LM exceed B (0 = off)")
    cu.add_argument("--dsir-keep", type=float, default=0.0, metavar="F",
                    help="keep only the top F fraction of train docs by "
                         "DSIR unigram log-likelihood ratio vs the "
                         "reference slice (0 = off)")
    cu.add_argument("--quality-gate", type=float, default=0.0, metavar="T",
                    help="drop docs scoring below T under the distributed-"
                         "LR quality classifier (0 = off)")
    cu.set_defaults(fn=cmd_curate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
