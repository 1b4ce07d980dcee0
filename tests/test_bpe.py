"""BPE trainer/encoder exactness: the distributed-histogram trainer and
the actor-pool encoder must match a naive full-recount reference
(Sennrich et al. 2016 algorithm) exactly."""

import pandas as pd
import pytest

from sociallink_ray.stages.bpe import (
    _EOW,
    encode_word,
    merge_ranks,
    train_bpe,
    word_histogram,
)


def ref_train(word_counts: dict, num_merges: int):
    """Naive reference: full pair recount every iteration, same
    (count desc, pair asc) tie-break. Returns (merges, final vocab
    as {original word: symbol tuple})."""
    seg = {w: tuple(list(w) + [_EOW]) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for w, syms in seg.items():
            c = word_counts[w]
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        top = max(pairs.values())
        if top <= 0:
            break
        pair = min(p for p, c in pairs.items() if c == top)
        merges.append(pair)
        out_seg = {}
        for w, syms in seg.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_seg[w] = tuple(out)
        seg = out_seg
    return merges, seg


WORDS = {
    "low": 5, "lower": 2, "newest": 6, "widest": 3, "new": 4,
    "west": 2, "lowest": 1, "news": 3, "a": 7, "aa": 2, "aaaa": 1,
}


def test_train_bpe_matches_naive():
    hist = pd.DataFrame(
        {"word": list(WORDS), "count": list(WORDS.values())}
    )
    got = train_bpe(hist, 20)
    exp, _ = ref_train(WORDS, 20)
    assert got == exp
    assert len(got) > 5


def test_encode_matches_training_segmentation():
    """Rank-order inference must reproduce the segmentation the trainer
    left each histogram word in (including repeated-pair words like
    'aaaa' where overlap order matters)."""
    merges, seg = ref_train(WORDS, 20)
    ranks = merge_ranks(merges)
    for w, syms in seg.items():
        assert tuple(encode_word(w, ranks)) == syms, w


def test_bpe_token_counts_end_to_end(ray_session):
    import ray.data as rd

    from sociallink_ray.stages.bpe import bpe_token_counts

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the newest west low lower",
                "newest newest widest low",
                "a aa aaaa new news",
                "",
            ],
        }
    )
    ds = rd.from_pandas(docs)
    out, merges = bpe_token_counts(ds, "text", "doc_id", num_merges=12, top_k=100)
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    # reference: histogram over the same corpus, naive train + encode
    wc: dict = {}
    for t in docs["text"]:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    exp_merges, _ = ref_train(wc, 12)
    assert merges == exp_merges
    ranks = merge_ranks(exp_merges)
    exp_counts = [
        sum(len(encode_word(w, ranks)) for w in t.split())
        for t in docs["text"]
    ]
    assert list(got["n_bpe_tokens"]) == exp_counts
    assert int(got.loc[got["doc_id"] == 4].shape[0]) == 1  # empty doc kept


def test_word_histogram_top_k_cap(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(
        pd.DataFrame({"text": ["b b b a a c", "a c d"]})
    )
    hist = word_histogram(ds, "text", top_k=2)
    # a:3 b:3 c:2 d:1 -> top2 by (count desc, word asc) = a, b
    assert list(hist["word"]) == ["a", "b"]
    assert list(hist["count"]) == [3, 3]


def test_bpe_deterministic_under_repartition(ray_session, sf_dir):
    """Histogram exactness + seedless greedy training make the whole
    operator independent of block layout: identical merges and counts
    at 2 and 7 partitions of the same corpus."""
    import ray.data as rd

    from sociallink_ray.stages.bpe import bpe_token_counts

    outs = []
    for p in (2, 7):
        ds = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).repartition(p)
        out, merges = bpe_token_counts(ds, "text", "doc_id", num_merges=32)
        outs.append(
            (merges, out.to_pandas().sort_values("doc_id").reset_index(drop=True))
        )
    assert outs[0][0] == outs[1][0]
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])
