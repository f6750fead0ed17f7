"""Pin rel_holt_linear and text_dup_ngram_coverage against naive
independent references on the real fixture corpus (sf0.001).

- Holt: a straight Python float recurrence (l,b updated day by day over
  each user's restart window) must agree with the engine's exact
  integer-coefficient linear form to float display precision.
- Dup coverage: a brute-force position-set union (mark every token
  index under any duplicated 8-gram start) must equal the engine's
  LEAD-based interval union exactly.
"""

from __future__ import annotations

import duckdb

from traj_sim_spark_spark.operators.extras5 import (
    _DUPCOV_N,
    _HOLT_D,
    _HOLT_NB,
    _HOLT_NL,
    _HOLT_W,
    rel_holt_linear,
    text_dup_ngram_coverage,
)


def test_holt_coeffs_are_the_recurrence():
    """The cleared-denominator coefficients must BE the alpha=beta=1/2
    restart recurrence: re-simulate in floats on random-ish series and
    compare the linear-form result."""
    w = _HOLT_W
    series = [
        [float((i * 37 + s * 13) % 101) for i in range(w)]
        for s in range(25)
    ]
    for ys in series:
        lv, tr = ys[0], 0.0
        for i in range(1, w):
            ln = (ys[i] + lv + tr) / 2
            tr = (ln - lv + tr) / 2
            lv = ln
        lin_l = sum(_HOLT_NL[j] * ys[w - 1 - j] for j in range(w)) / _HOLT_D
        lin_b = sum(_HOLT_NB[j] * ys[w - 1 - j] for j in range(w)) / _HOLT_D
        assert abs(lin_l - lv) < 1e-9 * max(1.0, abs(lv))
        assert abs(lin_b - tr) < 1e-9 * max(1.0, abs(tr))


def test_holt_matches_python_recurrence(spark, sf_dir):
    """Engine output == per-user Python recurrence over the dense daily
    grid (restart window ending at each emitted day)."""
    from traj_sim_spark_spark.operators.series import _daily_grid
    from traj_sim_spark_spark.tables import Tables

    w = _HOLT_W
    grid = {}
    for r in _daily_grid(Tables(spark, sf_dir)).collect():
        grid.setdefault(r["user_id"], {})[r["dy"]] = r["si"]
    out = {
        (r["user_id"], r["dy"]): (r["level"], r["trend"], r["forecast"])
        for r in rel_holt_linear(spark, sf_dir).collect()
    }
    assert out
    expected = {}
    for uid, days in grid.items():
        ds = sorted(days)
        for pos in range(w - 1, len(ds)):
            win = [days[ds[pos - w + 1 + i]] / 1e6 for i in range(w)]
            lv, tr = win[0], 0.0
            for i in range(1, w):
                ln = (win[i] + lv + tr) / 2
                tr = (ln - lv + tr) / 2
                lv = ln
            expected[(uid, ds[pos])] = (lv, tr, lv + tr)
    assert set(out) == set(expected)
    for k, (lv, tr, fc) in expected.items():
        ol, ot, of = out[k]
        assert abs(ol - lv) < 1e-5
        assert abs(ot - tr) < 1e-5
        assert abs(of - fc) < 1e-5


def test_dup_coverage_equals_position_set_union(spark, sf_dir):
    """covered_tok must equal the size of the exact set of token
    positions lying under any duplicated n-gram start (brute force)."""
    n = _DUPCOV_N
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    grams: dict[str, int] = {}
    starts: dict[int, list[int]] = {}
    toks = {}
    for doc_id, text in docs:
        tl = text.split(" ")
        toks[doc_id] = tl
        starts[doc_id] = []
        for i in range(len(tl) - n + 1):
            g = " ".join(tl[i : i + n])
            grams[g] = grams.get(g, 0) + 1
    expected = {}
    for doc_id, text in docs:
        tl = toks[doc_id]
        covered: set[int] = set()
        n_dup = 0
        for i in range(len(tl) - n + 1):
            g = " ".join(tl[i : i + n])
            if grams[g] >= 2:
                n_dup += 1
                covered.update(range(i, i + n))
        expected[doc_id] = (len(tl), n_dup, len(covered))
    out = {
        r["doc_id"]: (r["n_tok"], r["n_dup_starts"], r["covered_tok"])
        for r in text_dup_ngram_coverage(spark, sf_dir).collect()
    }
    assert out == expected
    assert any(v[2] > 0 for v in out.values())


def test_dedup_cut_consistent_with_coverage(spark, sf_dir):
    """text_dedup_cut and text_dup_ngram_coverage must agree:
    kept_tok == n_tok - covered_tok for every doc, and the cleaned
    hash of an untouched doc equals md5 of its original text."""
    import hashlib

    import duckdb

    from traj_sim_spark_spark.operators.extras5 import (
        text_dedup_cut,
        text_dup_ngram_coverage,
    )

    cov = {
        r["doc_id"]: (r["n_tok"], r["covered_tok"])
        for r in text_dup_ngram_coverage(spark, sf_dir).collect()
    }
    cut = {
        r["doc_id"]: (r["n_tok"], r["kept_tok"], r["content_hash"])
        for r in text_dedup_cut(spark, sf_dir).collect()
    }
    assert set(cov) == set(cut)
    for d, (n, covered) in cov.items():
        nt, kept, h = cut[d]
        assert nt == n
        assert kept == n - covered
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    untouched = [d for d, (n, c) in cov.items() if c == 0]
    assert untouched
    for d in untouched[:50]:
        assert cut[d][2] == hashlib.md5(texts[d].encode()).hexdigest()
