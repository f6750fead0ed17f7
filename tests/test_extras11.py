"""Invariant pins for the round-9-continuation operators (extras11).

The DuckDB oracles prove cross-engine agreement; these tests pin the
MATH — identities the operators' own definitions promise, checked from
independent recomputation (pure Python / closed-form), so a future
refactor that keeps both engines wrong-in-the-same-way still fails.
"""

from __future__ import annotations

from fractions import Fraction

import pytest

from traj_sim_spark_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _rows(spark, key):
    return registry.QUERIES[key](spark, SF).collect()


# ---------------------------------------------------------------------------
# coefficient identities (pure Python, no Spark)
# ---------------------------------------------------------------------------


def test_holt_winters_coeffs_constant_series():
    # a constant series y = c must give level = c, trend = 0 and
    # seasonal = 0 — i.e. the level taps sum to D and the trend /
    # seasonal taps sum to 0 (the filter reproduces constants exactly)
    from traj_sim_spark_spark.operators.extras11 import (
        _HW_D,
        _HW_NB,
        _HW_NL,
        _HW_NS,
        _HW_W,
    )

    assert len(_HW_NL) == len(_HW_NB) == len(_HW_NS) == _HW_W
    assert sum(_HW_NL) == _HW_D
    assert sum(_HW_NB) == 0
    assert sum(_HW_NS) == 0


def test_holt_winters_coeffs_match_direct_simulation():
    # the cleared-integer filter must reproduce a direct rational
    # simulation of the recurrence on an arbitrary concrete series
    from traj_sim_spark_spark.operators.extras11 import (
        _HW_D,
        _HW_M,
        _HW_NB,
        _HW_NL,
        _HW_NS,
        _HW_W,
    )

    y = [Fraction(3 * i * i - 7 * i + 11, 2) for i in range(_HW_W)]
    lv, tr = y[0], Fraction(0)
    seas = [Fraction(0)] * _HW_M
    for i in range(1, _HW_W):
        ln = (y[i] - seas[i % _HW_M] + lv + tr) / 2
        tn = (ln - lv + tr) / 2
        seas[i % _HW_M] = (y[i] - ln + seas[i % _HW_M]) / 2
        lv, tr = ln, tn
    # filter convention: coefficient j multiplies y at lag j days ago
    lev_f = sum(Fraction(_HW_NL[j]) * y[_HW_W - 1 - j] for j in range(_HW_W))
    trd_f = sum(Fraction(_HW_NB[j]) * y[_HW_W - 1 - j] for j in range(_HW_W))
    sea_f = sum(Fraction(_HW_NS[j]) * y[_HW_W - 1 - j] for j in range(_HW_W))
    assert lev_f == lv * _HW_D
    assert trd_f == tr * _HW_D
    assert sea_f == seas[_HW_W % _HW_M] * _HW_D


# ---------------------------------------------------------------------------
# result-shape invariants (one shared session, sf0.001)
# ---------------------------------------------------------------------------


def test_market_basket_identities(spark):
    for r in _rows(spark, "rel_market_basket"):
        assert 0 < r.n_both <= min(r.n_ant, r.n_cons) <= r.n_users
        # support * n_users == n_both (up to the 6-dp display round)
        assert abs(r.support * r.n_users - r.n_both) < 1e-2
        assert abs(r.confidence * r.n_ant - r.n_both) < 1e-2


def test_rfm_scores_partition_customers(spark):
    rows = _rows(spark, "rel_rfm_segments")
    assert all(
        1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        for r in rows
    )
    import duckdb

    truth = duckdb.sql(
        f"SELECT COUNT(DISTINCT o_custkey) FROM "
        f"read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    assert sum(r.n_customers for r in rows) == truth


def test_katz_score_recomposition(spark):
    from traj_sim_spark_spark.operators.extras11 import (
        _KATZ_W1,
        _KATZ_W2,
        _KATZ_W3,
    )

    for r in _rows(spark, "graph_katz"):
        assert (
            r.katz_micro
            == r.walks1 * _KATZ_W1 + r.walks2 * _KATZ_W2 + r.walks3 * _KATZ_W3
        )
        assert r.walks2 >= r.walks1  # every neighbor has degree >= 1


def test_bloom_fpr_bounds(spark):
    (r,) = _rows(spark, "sketch_bloom_fpr")
    from traj_sim_spark_spark.operators.extras11 import _BLOOM_K, _BLOOM_M

    assert 0 < r.n_bits_set <= min(r.n_keys * _BLOOM_K, _BLOOM_M)
    assert 0 <= r.n_fp <= r.n_probes
    assert 0.0 <= r.fill_frac <= 1.0
    assert 0.0 <= r.fpr_expected <= 1.0


def test_readability_bands(spark):
    rows = _rows(spark, "text_readability")
    assert all(0 <= r.flesch_band <= 20 for r in rows)
    assert all(r.avg_words_per_sentence > 0 for r in rows)


def test_markov_rows_are_distributions(spark):
    rows = _rows(spark, "rel_markov_transitions")
    by_src: dict[str, float] = {}
    for r in rows:
        assert r.n_pairs <= r.n_src_total
        by_src[r.src] = by_src.get(r.src, 0.0) + r.p_next
    for total in by_src.values():
        assert total == pytest.approx(1.0, abs=1e-4)


def test_entity_match_pair_bounds(spark):
    for r in _rows(spark, "rel_entity_match"):
        cmax = r.n_parts * (r.n_parts - 1) // 2
        assert 0 <= r.n_exact_pairs <= r.n_match_pairs <= cmax
        assert r.n_variants <= r.n_parts


def test_silhouette_in_range(spark):
    rows = _rows(spark, "emb_silhouette")
    assert len(rows) >= 1  # one row per label present at this sf
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0
        assert r.mean_intra_d2 >= 0 and r.mean_nearest_d2 >= 0


def test_source_overlap_ratio_bounds(spark):
    for r in _rows(spark, "text_source_overlap"):
        assert 0 < r.n_shared <= min(r.n_grams_a, r.n_grams_b)
        assert 0.0 < r.containment_a <= 1.0
        assert 0.0 < r.containment_b <= 1.0
        assert r.jaccard <= min(r.containment_a, r.containment_b) + 1e-9


def test_ams_f2_estimate_recomposition(spark):
    (r,) = _rows(spark, "sketch_ams_f2")
    gs = sorted([r.g1, r.g2, r.g3, r.g4])
    est = (gs[1] + gs[2]) / 2 / 8
    assert r.f2_est == pytest.approx(est, rel=1e-9)
    assert r.f2_true >= r.n_rows  # sum f^2 >= sum f
    assert r.rel_err == pytest.approx(
        (est - r.f2_true) / r.f2_true, abs=2e-6
    )


def test_skew_profile_partitions_rows(spark):
    rows = _rows(spark, "rel_skew_profile")
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert sum(r.n_rows for r in rows) == n
    for r in rows:
        # band b holds freqs in [2^b, 2^(b+1))
        assert 2**r.freq_log2_band <= r.min_freq
        assert r.max_freq < 2 ** (r.freq_log2_band + 1)


def test_cuped_adjustment_direction(spark):
    rows = _rows(spark, "rel_cuped")
    assert len(rows) == 2
    # both arms share one pooled theta
    assert rows[0].theta == rows[1].theta
    # adjusted means preserve the pooled post mean (CUPED is unbiased):
    # sum_a n_a * adj_a == sum_a n_a * post_a (theta terms cancel)
    lhs = sum(r.n_users * r.mean_post_adj for r in rows)
    rhs = sum(r.n_users * r.mean_post for r in rows)
    assert lhs == pytest.approx(rhs, abs=1e-2)
