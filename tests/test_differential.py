"""Differential fuzzing: random dialect queries vs DuckDB.

A seeded generator emits paired (dialect text, DuckDB SQL) programs over a
safe semantic subset — projections, numeric arithmetic, relop/boolean
predicates with the dialect's quirk semantics (half-open BETWEEN, null-safe
'=', count→double), group-by over exact integer aggregates. Both run over
the SAME typed rows (the engine's typed DataFrame is registered into
DuckDB), isolating the front-end+compiler as the unit under test.
"""

from __future__ import annotations

import random

import pytest

from csvtool_spark.engine import CsvEngine
from csvtool_spark.oracle import normalize
from tests.test_dialect import C, R, V

NUMERIC = ["fine", "fee"]
INTS = ["ticket", "count"]
STRINGS = ["plate", "state", "vtype", "make"]
STR_VALUES = ["NY", "NJ", "CA", "COM", "PAS", "TOYOT", "nope"]


class Gen:
    def __init__(self, rng: random.Random):
        self.r = rng

    def num_expr(self) -> tuple[str, str]:
        c = self.r.choice(NUMERIC + INTS)
        kind = self.r.randrange(4)
        if kind == 0:
            return c, c
        if kind == 1:
            k = self.r.randint(2, 9)
            return f"{c} * {k}", f"{c} * {k}"
        if kind == 2:
            c2 = self.r.choice(NUMERIC)
            return f"{c} + {c2}", f"{c} + {c2}"
        k = self.r.randint(1, 50)
        return f"{c} - {k}", f"{c} - {k}"

    def pred(self) -> tuple[str, str]:
        kind = self.r.randrange(6)
        if kind == 5:
            # dialect LIKE = case-insensitive anchored pattern ⇒ ILIKE twin
            c = self.r.choice(STRINGS)
            pat = self.r.choice(["%o%", "n%", "%a", "_o%", "co_", "%1%"])
            return f"{c} like '{pat}'", f"{c} ILIKE '{pat}'"
        if kind == 0:
            c = self.r.choice(NUMERIC + INTS)
            op = self.r.choice(["<", "<=", ">", ">="])
            v = self.r.randint(1, 400)
            return f"{c} {op} {v}", f"{c} {op} {v}"
        if kind == 1:
            c = self.r.choice(STRINGS)
            v = self.r.choice(STR_VALUES)
            if self.r.random() < 0.5:
                return f"{c} = {v}", f"{c} IS NOT DISTINCT FROM '{v}'"
            return f"{c} != {v}", f"NOT ({c} IS NOT DISTINCT FROM '{v}')"
        if kind == 2:
            c = self.r.choice(NUMERIC)
            a, b = sorted(self.r.sample(range(1, 500), 2))
            if self.r.random() < 0.3:
                a, b = b, a  # reversed bounds branch
            return (
                f"{c} between {a} and {b}",
                f"(CASE WHEN {c} >= {a} THEN {c} < {b} ELSE {c} >= {b} END)",
            )
        if kind == 3:
            c = self.r.choice(STRINGS)
            vals = self.r.sample(STR_VALUES, 2)
            lst_d = ", ".join(vals)
            lst_s = ", ".join(f"'{v}'" for v in vals)
            return f"{c} in ({lst_d})", f"{c} IN ({lst_s})"
        c = self.r.choice(INTS)
        m = self.r.randint(2, 7)
        return f"{c} % {m} = 0", f"{c} % {m} IS NOT DISTINCT FROM 0"

    def preds(self) -> tuple[str, str]:
        d1, s1 = self.pred()
        roll = self.r.random()
        if roll < 0.15:
            return f"not ({d1})", f"NOT ({s1})"
        if roll < 0.5:
            return d1, s1
        d2, s2 = self.pred()
        if roll < 0.6:
            # xor on predicates is boolean inequality
            return f"({d1}) xor ({d2})", f"({s1}) <> ({s2})"
        op = self.r.choice(["and", "or"])
        # dialect logic chains are right-grouped; two terms are unambiguous
        return f"{d1} {op} {d2}", f"({s1}) {'AND' if op == 'and' else 'OR'} ({s2})"

    def scalar_expr(self) -> tuple[str, str]:
        kind = self.r.randrange(5)
        if kind == 0:
            # coalesce over a nullable string column
            lit = self.r.choice(STR_VALUES)
            return f"coalesce(note, {lit})", f"coalesce(note, '{lit}')"
        if kind == 1:
            c = self.r.choice(NUMERIC)
            k = self.r.randint(1, 300)
            return f"abs({c} - {k})", f"abs({c} - {k})"
        if kind == 2:
            # searched CASE, string branches
            dp, sp = self.pred()
            a, b = self.r.sample(STR_VALUES, 2)
            return (
                f"case when {dp} then {a} else {b} end",
                f"CASE WHEN {sp} THEN '{a}' ELSE '{b}' END",
            )
        if kind == 3:
            # truncating int division, divisor > 0
            c = self.r.choice(INTS)
            k = self.r.randint(2, 9)
            return (
                f"{c} / {k}",
                f"CAST(trunc(CAST({c} AS DOUBLE) / {k}) AS BIGINT)",
            )
        # string concat via '+'
        c = self.r.choice(STRINGS)
        lit = self.r.choice(STR_VALUES)
        return f"{c} + {lit}", f"{c} || '{lit}'"

    def grouped(self, having: bool) -> tuple[str, str]:
        g = self.r.choice(STRINGS)
        ic = self.r.choice(INTS)
        dsel = f"{g} count(*) as n sum({ic}) as s min({ic}) as mn max({ic}) as mx"
        ssel = (
            f"{g}, CAST(count(*) AS DOUBLE) AS n, sum({ic}) AS s, "
            f"min({ic}) AS mn, max({ic}) AS mx"
        )
        dwhere, swhere = self.preds()
        dtext = f"select {dsel} from {V} where {dwhere} group by {g}"
        sql = f"SELECT {ssel} FROM t WHERE {swhere} GROUP BY {g}"
        if having:
            thr = self.r.randint(10, 10_000)
            dtext += f" having sum({ic}) > {thr}"
            sql = f"SELECT * FROM ({sql}) h WHERE s > {thr}"
        elif self.r.random() < 0.5:
            # ordered grouped query (sort expr hoisted as hidden selection);
            # comparison is order-insensitive — this exercises the compile path
            how = self.r.choice(["", " asc"])
            dtext += f" order by sum({ic}){how}"
        return dtext, sql

    def projected(self, ordered: bool) -> tuple[str, str]:
        nsel = self.r.randint(1, 3)
        items = [self.num_expr() for _ in range(nsel)]
        if self.r.random() < 0.6:
            items.append(self.scalar_expr())
        dsel = " ".join(f"{d} as x{i}" for i, (d, _) in enumerate(items))
        ssel = ", ".join(f"{s} AS x{i}" for i, (_, s) in enumerate(items))
        dsel = "plate " + dsel
        ssel = "plate, " + ssel
        dwhere, swhere = self.preds()
        dtext = f"select {dsel} from {V} where {dwhere}"
        sql = f"SELECT {ssel} FROM t WHERE {swhere}"
        if ordered:
            how = self.r.choice(["", " asc"])
            dtext += f" order by {self.r.choice(NUMERIC + INTS)}{how}"
        return dtext, sql

    def topk(self) -> tuple[str, str]:
        # ticket is unique → deterministic row set under LIMIT; dialect
        # default order is DESC
        n = self.r.randint(5, 40)
        how = self.r.choice(["", " asc"])
        dwhere, swhere = self.preds()
        return (
            f"select top {n} ticket plate fine from {V} "
            f"where {dwhere} order by ticket{how}",
            f"SELECT ticket, plate, fine FROM t WHERE {swhere} "
            f"ORDER BY ticket {'ASC' if how else 'DESC'} LIMIT {n}",
        )

    def distinct(self) -> tuple[str, str]:
        c = self.r.choice(STRINGS)
        dwhere, swhere = self.preds()
        return (
            f"select distinct {c} from {V} where {dwhere}",
            f"SELECT DISTINCT {c} FROM t WHERE {swhere}",
        )

    def sampled(self) -> tuple[str, str]:
        # deterministic TABLESAMPLE: base-scan sample FIRST (rows numbered
        # 0-based in scan order, md5 coin), then the where filter — the
        # DuckDB twin reproduces both forms over the same registered rows
        coin = (
            "CAST(concat('0x', substr(md5('smp#' || CAST(__i AS VARCHAR)), 1, 8)) "
            "AS BIGINT)"
        )
        dwhere, swhere = self.preds()
        if self.r.random() < 0.5:
            f = self.r.choice(["0.25", "0.5", "0.75", "0.3"])
            thr = int(float(f) * 4294967296)  # the compiler's threshold rule
            return (
                f"select plate fine from {V} sample {f} where {dwhere}",
                # inner SELECT * so the random predicate can reference any
                # column, exactly like the dialect's where-after-sample
                f"SELECT plate, fine FROM "
                f"(SELECT *, row_number() OVER () - 1 AS __i FROM t) "
                f"WHERE {coin} < {thr} AND ({swhere})",
            )
        n = self.r.randint(20, 150)
        return (
            f"select plate ticket from {V} sample {n} where {dwhere}",
            f"SELECT plate, ticket FROM "
            f"(SELECT *, row_number() OVER () - 1 AS __i FROM t "
            f"ORDER BY {coin} ASC, __i ASC LIMIT {n}) WHERE {swhere}",
        )

    def join(self) -> tuple[str, str]:
        jt = self.r.choice(["join", "left join"])
        sj = "JOIN" if jt == "join" else "LEFT JOIN"
        thr = self.r.randint(0, 100)
        dtext = (
            f"nh select c.c1 c.c2 r.c2 as rname from {C} c {jt} {R} r "
            f"on c.c3 = r.c1 where c.c2 > {thr}"
        )
        sql = (
            f"SELECT c.c1, c.c2, r.c2 AS rname FROM cities c {sj} regions r "
            f"ON c.c3 = r.c1 WHERE c.c2 > {thr}"
        )
        return dtext, sql

    def query(self) -> tuple[str, str]:
        roll = self.r.random()
        if roll < 0.25:
            return self.projected(ordered=False)
        if roll < 0.40:
            return self.projected(ordered=True)
        if roll < 0.55:
            return self.grouped(having=False)
        if roll < 0.65:
            return self.grouped(having=True)
        if roll < 0.72:
            return self.distinct()
        if roll < 0.78:
            return self.topk()
        if roll < 0.85:
            return self.sampled()
        if roll < 0.91:
            return self.join()
        # legacy plain shape (no scalar tail) for continuity
        nsel = self.r.randint(1, 3)
        items = [self.num_expr() for _ in range(nsel)]
        dsel = " ".join(f"{d} as x{i}" for i, (d, _) in enumerate(items))
        ssel = ", ".join(f"{s} AS x{i}" for i, (_, s) in enumerate(items))
        dwhere, swhere = self.preds()
        return (
            f"select plate {dsel} from {V} where {dwhere}",
            f"SELECT plate, {ssel} FROM t WHERE {swhere}",
        )


@pytest.fixture(scope="module")
def duck_t(spark):
    import duckdb

    eng = CsvEngine(spark)
    con = duckdb.connect()
    con.register("t", eng.sql("select * from" + V).toPandas())
    # the engine displays noheader columns as col1..colN; the dialect
    # addresses them as cN — register the duck twins under the cN names
    cities = eng.sql("nh select * from" + C).toPandas()
    cities.columns = ["c1", "c2", "c3"]
    regions = eng.sql("nh select * from" + R).toPandas()
    regions.columns = ["c1", "c2"]
    con.register("cities", cities)
    con.register("regions", regions)
    return con


@pytest.mark.parametrize("seed", range(100))
def test_differential_random_query(spark, duck_t, seed):
    g = Gen(random.Random(1000 + seed))
    dtext, sql = g.query()
    eng = CsvEngine(spark)
    sdf = eng.sql(dtext)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck_t.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount mismatch\n{dtext}\n{sql}"
    sn = normalize(srows, sdf.columns)
    dn = normalize(drows, dcols)
    assert sn == dn, (
        f"value mismatch\n{dtext}\n{sql}\n"
        f"first diffs: {[(a, b) for a, b in zip(sn, dn) if a != b][:3]}"
    )
