"""Dedup/similarity scale-path guarantees: Catalyst SimHash parity,
frequent-token fence on the Jaccard index join, broadcast ceiling on
cosine_block_pairs."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from rsgislib_spark.functions.dedup import ngram_jaccard_pairs, simhash64


def _simhash_ref(text: str) -> int:
    """Row-at-a-time reference implementation (the pre-Catalyst kernel)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in set((text or "").split(" ")):
        if not tok:
            continue
        hv = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big", signed=False)
        bits = (hv >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    h = np.uint64(0)
    for b in range(64):
        if acc[b] > 0:
            h |= np.uint64(1) << np.uint64(b)
    return int(h.astype(np.uint64).view(np.int64))


def test_simhash_catalyst_matches_reference_kernel(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different content here",
        "single",
        "",
        "repeated repeated repeated token",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (
        simhash64(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("doc_id")["simhash"]
    )
    for i, t in enumerate(texts):
        assert int(got[i]) == _simhash_ref(t), (i, t)


def test_ngram_jaccard_fence_keeps_exact_scores(spark):
    # near-dup pair (0,1) shares rare tokens; every doc shares stop words
    texts = [
        "the a of alpha beta gamma delta",
        "the a of alpha beta gamma epsilon",
        "the a of zeta eta theta iota",
        "the a of kappa lumen mu nu",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    full = ngram_jaccard_pairs(df, threshold=0.1).toPandas()
    fenced = ngram_jaccard_pairs(df, threshold=0.1, max_token_df=2).toPandas()
    fk = {(r.id_a, r.id_b): r.jaccard for r in fenced.itertuples(index=False)}
    # the true near-dup survives with its EXACT (full-token-set) jaccard
    want = full.set_index(["id_a", "id_b"]).loc[(0, 1), "jaccard"]
    assert fk[(0, 1)] == want == pytest.approx(6 / 8, abs=1e-6)
    # pairs overlapping only in stop words (df=4 > cap) are not candidates
    assert (2, 3) not in fk


def test_ngram_jaccard_fence_blocks_stopword_blowup(spark):
    # 60 docs sharing ONE stop word: uncapped index join would build
    # 60*59/2 pairs from it; capped builds none
    texts = [f"stopword unique{i} only{i}" for i in range(60)]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    df = spark.createDataFrame(pdf)
    fenced = ngram_jaccard_pairs(df, threshold=0.0, max_token_df=5).toPandas()
    assert len(fenced) == 0


def test_minhash_at_production_permutation_count(spark):
    """128 permutations / 32 bands (a realistic pipeline config, not the
    toy default): near-dup pairs are found, disjoint docs are not."""
    from rsgislib_spark.functions.dedup import minhash_band_pairs

    texts = [
        " ".join(f"tok{j}" for j in range(50)),                       # base
        " ".join(f"tok{j}" for j in list(range(48)) + [99, 98]),      # ~92% jaccard
        " ".join(f"other{j}" for j in range(50)),                     # disjoint
    ]
    pdf = pd.DataFrame({"doc_id": range(3), "text": texts})
    got = minhash_band_pairs(
        spark.createDataFrame(pdf), n_seeds=128, n_bands=32
    ).toPandas()
    pairs = set(map(tuple, got[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairs           # near-dup caught (4-row bands, j≈0.92)
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_band_masks():
    import numpy as np

    from rsgislib_spark.kernels.bands import edge_mask, finite_mask, valid_mask

    a = np.array([[1.0, np.nan], [np.inf, 4.0]])
    assert finite_mask(a).tolist() == [[1, 0], [0, 1]]
    b1 = np.array([[0, 2], [3, 0]])
    b2 = np.array([[1, 2], [0, 4]])
    assert valid_mask([b1, b2], 0).tolist() == [[0, 1], [0, 0]]
    em = edge_mask(4, 5, 1)
    assert em.sum() == 2 * 5 + 2 * 2 and em[1:-1, 1:-1].sum() == 0


def test_cosine_block_pairs_raises_above_ceiling(spark):
    from rsgislib_spark.functions.similarity import cosine_block_pairs

    pdf = pd.DataFrame(
        {"vec_id": range(10), "embedding": [[1.0, float(i)] for i in range(10)]}
    )
    emb = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        cosine_block_pairs(emb, threshold=0.9, max_broadcast_rows=5)
    # under the ceiling it still runs
    out = cosine_block_pairs(emb, threshold=0.999, max_broadcast_rows=100).toPandas()
    assert {"id_a", "id_b", "cos"} == set(out.columns)


class TestConnectedComponents:
    """Distributed CC (min-label propagation + pointer jumping) on
    hand-built edge lists — the dedup group-assignment stage."""

    def _cc(self, spark, edges):
        from rsgislib_spark.functions.dedup import connected_components

        pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
        out = connected_components(spark.createDataFrame(pdf)).toPandas()
        return dict(zip(out["node"].astype(int), out["label"].astype(int)))

    def test_two_components_and_chain(self, spark):
        # chain 1-2-3-4 (diameter 3, exercises pointer jumping) + pair 10-11
        lab = self._cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
        assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_edge_order_and_direction_irrelevant(self, spark):
        lab = self._cc(spark, [(4, 3), (11, 10), (2, 1), (3, 2)])
        assert lab == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        # 30-node path: naive propagation needs 29 rounds; pointer
        # jumping must converge well under the 25-round cap
        lab = self._cc(spark, [(i, i + 1) for i in range(30)])
        assert set(lab.values()) == {0} and len(lab) == 31

    def test_star_and_triangle(self, spark):
        lab = self._cc(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
        assert lab == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7, 9: 7}


class TestDuplicatedSpanStats:
    """Exact substring (n-gram span) dedup — Lee et al. 2022 semantics:
    a span is duplicated only when >= min_docs DISTINCT docs carry it."""

    def _run(self, spark, docs, n=8):
        from rsgislib_spark.functions.dedup import duplicated_span_stats

        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        out = duplicated_span_stats(spark.createDataFrame(pdf), n=n).toPandas()
        return {
            int(r.doc_id): (int(r.n_spans), int(r.n_dup_spans))
            for r in out.itertuples(index=False)
        }

    def test_cross_doc_span_counts(self, spark):
        shared = "a b c d e f g h"  # one 8-token span shared by docs 1, 2
        got = self._run(
            spark,
            [
                (1, shared + " x"),          # 9 tokens -> 2 spans, 1 dup
                (2, "z " + shared),          # 9 tokens -> 2 spans, 1 dup
                (3, "q w e r t y u i o p"),  # 10 tokens -> 3 spans, 0 dup
            ],
        )
        assert got == {1: (2, 1), 2: (2, 1), 3: (3, 0)}

    def test_within_doc_repeat_not_duplicated(self, spark):
        # "m..t" occurs twice in ONE doc: multiplicity 2, distinct docs 1
        got = self._run(spark, [(1, "m n o p q r s t m n o p q r s t"),
                                (2, "a b c d e f g h i")])
        assert got[1] == (9, 0)

    def test_short_docs_pass_through_and_multiplicity_summed(self, spark):
        shared = "a b c d e f g h"
        got = self._run(
            spark,
            [
                (1, shared + " " + shared),  # 16 tokens; the shared span at
                                             # pos 1 and 9 both count once dup'd
                (2, shared),
                (3, "too short"),            # < 8 tokens: (0, 0), NOT dropped
            ],
        )
        assert got[3] == (0, 0)
        assert got[2] == (1, 1)
        assert got[1][1] >= 2  # both occurrences of the shared span count


class TestRemoveDuplicatedSpans:
    """Span scrub: every token covered by a cross-doc duplicated span is
    dropped; overlapping spans union via per-position coverage."""

    def _run(self, spark, docs, n=8):
        from rsgislib_spark.functions.dedup import remove_duplicated_spans

        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        out = remove_duplicated_spans(spark.createDataFrame(pdf), n=n).toPandas()
        return {
            int(r.doc_id): (int(r.n_tok), int(r.n_kept), int(r.n_removed))
            for r in out.itertuples(index=False)
        }

    def test_shared_span_removed_both_sides(self, spark):
        shared = "a b c d e f g h"
        got = self._run(
            spark,
            [(1, shared + " x"), (2, "z " + shared), (3, "q w e r t y u i o p")],
        )
        # docs 1/2 lose the 8 shared tokens, keep their 1 unique token
        assert got[1] == (9, 1, 8)
        assert got[2] == (9, 1, 8)
        assert got[3] == (10, 10, 0)

    def test_overlapping_spans_union(self, spark):
        # 9 shared tokens -> two overlapping dup spans covering all 9
        shared9 = "a b c d e f g h i"
        got = self._run(spark, [(1, shared9 + " p"), (2, shared9 + " q")])
        assert got[1] == (10, 1, 9)

    def test_scrubbed_text_fingerprint(self, spark):
        import hashlib

        from rsgislib_spark.functions.dedup import remove_duplicated_spans

        shared = "a b c d e f g h"
        pdf = pd.DataFrame(
            [(1, "u v " + shared + " w"), (2, shared + " k")],
            columns=["doc_id", "text"],
        )
        out = (
            remove_duplicated_spans(spark.createDataFrame(pdf), n=8)
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[1, "kept_md5"] == hashlib.md5(b"u v w").hexdigest()
        assert out.loc[2, "kept_md5"] == hashlib.md5(b"k").hexdigest()

    def test_short_doc_passes_through_unchanged(self, spark):
        import hashlib

        shared = "a b c d e f g h"
        got = self._run(
            spark,
            [(1, shared + " x"), (2, "z " + shared), (3, "too short")],
        )
        # a 2-token doc can hold no 8-token span: unchanged, not dropped
        assert got[3] == (2, 2, 0)

        from rsgislib_spark.functions.dedup import remove_duplicated_spans

        pdf = pd.DataFrame([(3, "too short")], columns=["doc_id", "text"])
        out = remove_duplicated_spans(spark.createDataFrame(pdf), n=8).toPandas()
        assert out.loc[0, "kept_md5"] == hashlib.md5(b"too short").hexdigest()


class TestDecontaminate:
    def test_overlap_flags_and_counts(self, spark):
        from rsgislib_spark.functions.dedup import decontaminate

        probe = "a b c d e f g h i"  # 9 tokens -> 2 probe spans
        corpus = pd.DataFrame(
            [
                (1, "x " + "a b c d e f g h" + " y"),  # hits span 1 once
                (2, "p q r s t u v w x y"),            # clean
                (3, probe),                            # identical -> 2 hits
            ],
            columns=["doc_id", "text"],
        )
        probes = pd.DataFrame([(100, probe)], columns=["doc_id", "text"])
        out = decontaminate(
            spark.createDataFrame(corpus), spark.createDataFrame(probes), n=8
        ).toPandas().set_index("doc_id")
        assert bool(out.loc[1, "is_contaminated"]) and int(out.loc[1, "n_hits"]) == 1
        assert not bool(out.loc[2, "is_contaminated"])
        assert int(out.loc[3, "n_hits"]) == 2

    def test_short_corpus_doc_reported_clean(self, spark):
        from rsgislib_spark.functions.dedup import decontaminate

        corpus = pd.DataFrame(
            [(1, "too short"), (2, "a b c d e f g h i")],
            columns=["doc_id", "text"],
        )
        probes = pd.DataFrame([(100, "a b c d e f g h")], columns=["doc_id", "text"])
        out = decontaminate(
            spark.createDataFrame(corpus), spark.createDataFrame(probes), n=8
        ).toPandas().set_index("doc_id")
        # the 2-token doc holds no span: clean with 0 spans, NOT missing
        assert int(out.loc[1, "n_spans"]) == 0
        assert int(out.loc[1, "n_hits"]) == 0
        assert not bool(out.loc[1, "is_contaminated"])


class TestScrubPii:
    def test_counts_and_replacement(self, spark):
        from rsgislib_spark.functions.textops import scrub_pii

        pdf = pd.DataFrame(
            [
                (1, "mail me at jo.doe@site.org or call 555-1234 ok"),
                (2, "no pii here"),
                (3, "two mails a@b.co c.d@e.fg and 111-2222 333-4444"),
            ],
            columns=["doc_id", "text"],
        )
        out = scrub_pii(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
        assert int(out.loc[1, "n_emails"]) == 1 and int(out.loc[1, "n_phones"]) == 1
        assert out.loc[1, "scrubbed"] == "mail me at <EMAIL> or call <TEL> ok"
        assert int(out.loc[2, "n_emails"]) == 0 and out.loc[2, "scrubbed"] == "no pii here"
        assert int(out.loc[3, "n_emails"]) == 2 and int(out.loc[3, "n_phones"]) == 2

    def test_phone_inside_email_not_double_counted(self, spark):
        from rsgislib_spark.functions.textops import scrub_pii

        pdf = pd.DataFrame([(1, "x 555-123456@host.net y")], columns=["doc_id", "text"])
        out = scrub_pii(spark.createDataFrame(pdf)).toPandas().iloc[0]
        # the email regex consumes the digits; phone count sees the
        # post-email-scrub text
        assert int(out["n_emails"]) == 1 and int(out["n_phones"]) == 0
