"""Model-based differential tests: the scale join/merge operators vs
naive pure-Python reference models on seeded random inputs. The operators
use non-obvious formulations (union+window, grid buckets, full-outer
sentinels) — these tests pin their semantics against the obvious O(n²)
definitions across many random shapes, including ties, nulls, and
empty sides."""

from __future__ import annotations

import random

import pytest


def _py_asof(left, right, direction="backward"):
    """Naive model: for each left (id, k, t), the matching right (k, t, tag)."""
    out = {}
    for lid, lk, lt in left:
        best = None
        for rk, rt, tag in right:
            if rk != lk or rk is None or lt is None or rt is None:
                continue
            if direction == "backward":
                if rt <= lt and (best is None or rt > best[0]):
                    best = (rt, tag)
            else:
                if rt >= lt and (best is None or rt < best[0]):
                    best = (rt, tag)
        out[lid] = best
    return out


@pytest.mark.parametrize("seed", range(8))
def test_asof_matches_naive_model(spark, seed):
    from csvtool_spark.operators.asof import asof_join

    r = random.Random(seed)
    keys = ["a", "b", "c"]
    left = [(i, r.choice(keys), r.randint(0, 50)) for i in range(40)]
    # unique (k, t) on the right: the operator defines ties at identical
    # (key, ts) as last-in-window — dedupe to keep the model aligned
    seen, right = set(), []
    for j in range(25):
        k, t = r.choice(keys), r.randint(0, 50)
        if (k, t) not in seen:
            seen.add((k, t))
            right.append((k, t, f"tag{j}"))
    direction = r.choice(["backward", "forward"])

    ldf = spark.createDataFrame(left, "id long, k string, t long")
    rdf = spark.createDataFrame(right, "k string, t long, tag string")
    got = {
        row.id: (row.t_r, row.tag)
        for row in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t",
                             direction=direction).collect()
    }
    model = _py_asof(left, right, direction)
    for lid, want in model.items():
        have = got[lid]
        assert have == (want if want else (None, None)), (
            f"seed={seed} dir={direction} id={lid}: {have} != {want}"
        )


@pytest.mark.parametrize("seed", range(8))
def test_range_join_matches_naive_model(spark, seed):
    from csvtool_spark.operators.rangejoin import range_join

    r = random.Random(100 + seed)
    pts = [(i, float(r.randint(-40, 120))) for i in range(40)]
    ivs = []
    for j in range(15):
        lo = float(r.randint(-50, 100))
        ivs.append((j, lo, lo + float(r.randint(0, 60))))
    width = r.choice([7.0, 10.0, 33.0])

    pdf = spark.createDataFrame(pts, "pid long, v double")
    idf = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    got = sorted(
        (row.pid, row.iid)
        for row in range_join(pdf, idf, "v", "lo", "hi", width).collect()
    )
    model = sorted(
        (pid, iid)
        for pid, v in pts
        for iid, lo, hi in ivs
        if lo <= v < hi
    )
    assert got == model, f"seed={seed} width={width}"


@pytest.mark.parametrize("seed", range(6))
def test_merge_upsert_matches_dict_model(spark, seed):
    from csvtool_spark.operators.merge import merge_upsert

    r = random.Random(200 + seed)
    target = [(i, f"n{i}", r.randint(0, 9)) for i in r.sample(range(20), 12)]
    updates = [
        (k, f"u{k}", r.randint(10, 19), r.random() < 0.3)
        for k in r.sample(range(25), 10)
    ]

    model = {k: (n, v) for k, n, v in target}
    for k, n, v, dele in updates:
        if dele:
            model.pop(k, None)
        else:
            model[k] = (n, v)

    tdf = spark.createDataFrame(target, "id long, name string, v long")
    udf = spark.createDataFrame(updates, "id long, name string, v long, d boolean")
    got = {
        row.id: (row.name, row.v)
        for row in merge_upsert(tdf, udf, "id", delete_col="d").collect()
    }
    assert got == model, f"seed={seed}"


@pytest.mark.parametrize("seed", range(6))
def test_asof_bucketed_equals_plain(spark, seed):
    # the skew-resistant bucketed form must be semantically identical to
    # the plain union+window asof, across widths, gaps, and one hot key
    from csvtool_spark.operators.asof import asof_join, asof_join_bucketed

    r = random.Random(300 + seed)
    hot = "hot"
    left = [(i, hot if r.random() < 0.5 else r.choice("abc"), r.randint(0, 400))
            for i in range(120)]
    seen, right = set(), []
    for j in range(60):
        k, t = (hot if r.random() < 0.5 else r.choice("abc")), r.randint(0, 400)
        if (k, t) not in seen:
            seen.add((k, t))
            right.append((k, t, f"tag{j}"))
    width = r.choice([7.0, 50.0, 1000.0])   # incl. one-bucket degenerate

    ldf = spark.createDataFrame(left, "id long, k string, t long")
    rdf = spark.createDataFrame(right, "k string, t long, tag string")
    plain = {
        row.id: (row.t_r, row.tag)
        for row in asof_join(ldf, rdf, on="k", left_ts="t", right_ts="t").collect()
    }
    bucketed = {
        row.id: (row.t_r, row.tag)
        for row in asof_join_bucketed(
            ldf, rdf, on="k", left_ts="t", right_ts="t", bucket_width=width
        ).collect()
    }
    assert bucketed == plain, f"seed={seed} width={width}"


# --- Naive Bayes classifier vs pure-Python model ---------------------------


def _py_nb(rows, vocab_size):
    """Naive model: same vocab cap, Laplace smoothing, fixed-point 1e6
    log-probs, first-class-wins argmax — all in plain Python."""
    import math
    from collections import Counter

    from csvtool_spark.functions.fixedpoint import half_away as _half_away

    classes = sorted({lbl for _, _, lbl in rows if lbl is not None})
    tok_counts = Counter()
    per_class = {c: Counter() for c in classes}
    for _, text, lbl in rows:
        for t in (text or "").split(" ") if text is not None else []:
            tok_counts[t] += 1
            if lbl is not None:
                per_class[lbl][t] += 1
    # top-V by (count desc, token asc)
    vocab = sorted(tok_counts, key=lambda t: (-tok_counts[t], t))[:vocab_size]
    vset = set(vocab)
    v = len(vocab)
    tot = {c: sum(per_class[c][t] for t in vocab) for c in classes}
    lp = {
        (t, c): _half_away(math.log((per_class[c][t] + 1) / (tot[c] + v)) * 1e6)
        for t in vocab
        for c in classes
    }
    dflt = {c: _half_away(math.log(1.0 / (tot[c] + v)) * 1e6) for c in classes}
    n_lbl = sum(1 for _, _, lbl in rows if lbl is not None)
    prior = {
        c: _half_away(math.log(sum(1 for _, _, l in rows if l == c) / n_lbl) * 1e6)
        for c in classes
    }
    out = {}
    for doc_id, text, lbl in rows:
        scores = {}
        for c in classes:
            s = prior[c]
            for t in (text or "").split(" ") if text is not None else []:
                s += lp[(t, c)] if t in vset else dflt[c]
            scores[c] = s
        best = max(scores.values())
        pred = next(c for c in classes if scores[c] == best)
        out[doc_id] = (pred, best)
    return out


@pytest.mark.parametrize("seed", range(6))
def test_nb_matches_naive_model(spark, seed):
    from csvtool_spark.operators import classify

    r = random.Random(seed)
    words = {
        "x": ["aa", "bb", "cc", "dd", "shared"],
        "y": ["ee", "ff", "gg", "shared", "hh"],
        "z": ["ii", "jj", "shared", "kk", "ll"],
    }
    rows = []
    for i in range(50):
        lbl = r.choice(list(words))
        n = r.randint(0, 10)
        rows.append((i, " ".join(r.choice(words[lbl]) for _ in range(n)), lbl))
    rows.append((50, None, "x"))
    vocab_size = r.choice([3, 8, 100])
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = classify.nb_train(d, vocab_size=vocab_size)
    got = {
        r2.doc_id: (r2.pred, r2.score_pred)
        for r2 in classify.nb_score(d, model).collect()
    }
    assert got == _py_nb(rows, vocab_size)
