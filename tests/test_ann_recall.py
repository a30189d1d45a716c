"""Recall checks for the approximate similarity/dedup paths: the weak
(rows-only) driver checks don't measure quality, so these tests pin
minimum recall vs the exact brute-force baseline."""

from __future__ import annotations

import ingest_sharepoint_file_to_fabric_lakehouse_spark as engine

engine.load_all()


def _topk_sets(df, k_col="q_id", v_col="vec_id"):
    out = {}
    for r in df.collect():
        out.setdefault(r[k_col], set()).add(r[v_col])
    return out


def test_ivf_probe_recall_vs_bruteforce(spark, sf_dir):
    exact = _topk_sets(engine.QUERIES["sim_topk_bruteforce"](spark, sf_dir))
    approx = _topk_sets(engine.QUERIES["sim_ivf_probe"](spark, sf_dir))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    # 2-of-10 cells probed on random vectors: modest but real recall
    assert sum(recalls) / len(recalls) >= 0.2, recalls


def test_lsh_candidates_are_bucket_consistent(spark, sf_dir):
    """LSH top-k must be a subset of the full ranking and every
    returned neighbor shares the query's bucket by construction —
    sanity: results are valid vectors with sane cosine range."""
    res = engine.QUERIES["sim_topk_lsh"](spark, sf_dir).collect()
    assert len(res) > 0
    for r in res:
        assert -1.0 <= r.cos_sim <= 1.0
        assert r.vec_id != r.q_id


def test_banded_lsh_recall_vs_bruteforce(spark, sf_dir):
    """The multi-probe banded (6 tables × 6 bits, radius-1 probes)
    production LSH must hold recall ≥ 0.6 against exact top-10 — the
    round-7 single-table form measured ~0 recall (shattered buckets),
    the round-8 exact-probe 4×4 form 0.33-0.47; multi-probe measures
    0.73-0.77 at every fixture.  The construction is deterministic
    (frozen planes, fixed data), so the floor is a regression pin,
    not a flaky statistical bound."""
    exact = _topk_sets(engine.QUERIES["sim_topk_bruteforce"](spark, sf_dir))
    approx = _topk_sets(engine.QUERIES["sim_topk_lsh"](spark, sf_dir))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_minhash_estimates_track_exact_jaccard(spark, sf_dir):
    """MinHash estimated Jaccard within 0.35 absolute of exact n-gram
    Jaccard on the pairs both report (32 hashes ⇒ se ≈ 0.09)."""
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in engine.QUERIES["dedup_fuzzy_minhash"](spark, sf_dir).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in engine.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    common = set(est) & set(exact)
    for pair in common:
        assert abs(est[pair] - exact[pair]) <= 0.35, (pair, est[pair], exact[pair])


def test_pq_adc_recall_vs_bruteforce(spark, sf_dir):
    """PQ-ADC approximate top-10 must substantially agree with the
    exact brute-force top-10.  The Lloyd-refined subspace codebooks
    plus the exact re-rank of the ADC top-100 shortlist recover most
    true neighbors (measured 0.8 mean recall@10 at sf0.001); the floor
    leaves margin for corpus regeneration."""
    exact = _topk_sets(engine.QUERIES["sim_topk_bruteforce"](spark, sf_dir))
    approx = _topk_sets(engine.QUERIES["sim_pq_adc_topk"](spark, sf_dir))
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_ivfpq_recovers_ivf_recall(spark, sf_dir):
    """IVF-PQ searches the same probed cells as the plain IVF probe but
    ranks from 8-byte codes; the exact re-rank of its ADC top-100 must
    recover (nearly) the IVF recall ceiling — compression may not cost
    recall once the shortlist is re-ranked.  (Measured: identical
    recall at sf0.001.)"""
    exact = _topk_sets(engine.QUERIES["sim_topk_bruteforce"](spark, sf_dir))
    ivf = _topk_sets(engine.QUERIES["sim_ivf_probe"](spark, sf_dir))
    ivfpq = _topk_sets(engine.QUERIES["sim_topk_ivfpq"](spark, sf_dir))

    def mean_recall(ap):
        return sum(
            len(exact[q] & ap.get(q, set())) / len(exact[q]) for q in exact
        ) / len(exact)

    assert mean_recall(ivfpq) >= mean_recall(ivf) - 0.1, (
        mean_recall(ivfpq),
        mean_recall(ivf),
    )
