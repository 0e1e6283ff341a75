"""End-to-end dialect tests mirroring the reference's test strategy
(/root/reference/main_test.go): positive queries must run, the semantic
error battery must be rejected by the front-end — plus golden-value checks
the reference never had.
"""

from __future__ import annotations

import os

import pytest

from csvtool_spark.dialect.errors import DialectError, ParseError
from csvtool_spark.engine import CsvEngine

DATA = os.path.join(os.path.dirname(__file__), "data")
V = f" '{DATA}/violations.csv' "
C = f" '{DATA}/cities.csv' "
R = f" '{DATA}/regions.csv' "


@pytest.fixture(scope="module")
def eng(spark):
    return CsvEngine(spark)


GOOD = [
    "select top 20 from" + V,
    "select top 20 * from" + V,
    "select top 20 plate from" + V + "where plate like '%L1%'",
    "select top 20 plate 'Issue' count+count+10 as isum 'i2'=count fine+fee+10.2 as fadd "
    "fine*fee*10.2 as fmult fee / fine / 10.2 as fdiv from" + V,
    "select top 20 floaty = case count when 7 then 7.12 when 40 then 40.23 else 12.3 end "
    "case count when 5 then 72.12 else 612.3 end as floaty2 from" + V,
    "select top 20 fine+count as fi fine*count as fim plate+'1/12/1999' as strdate from" + V,
    "select top 20-fine-fee as confusing -ticket (-fee)+ticket from" + V,
    "select top 20 fine fee from" + V + "where fee<10*fine",
    "select top 20 count from" + V + "where count != count",
    "select top 20 plate from" + V + "where issued between '8/1/2016' and '10/30/2016'",
    "select top 20 plate from" + V + "where issued not between '8/1/2016' and '10/30/2016'",
    "select top 20 plate from" + V + "where (plate = PL1000 or plate = PL1001) "
    "and ((((plate = (PL1000))) or plate=PL1001))",
    "select top 20 state vtype case vtype when COM then 1 when OMT then 2 else 4 end from" + V
    + "where case vtype when COM then 1 when OMT then 2 else 4 end = 1",
    "select top 5 1 2 3 '1' '2' '3' from" + V,
    "c select top 5 1 2 3 from" + V,
    "select top 20 count from" + V + "where count % 2 = 0",
    "select count count % 2 case when count % 2 = 1 then odd when not count % 2 = 1 then even end from" + V,
    "select top 10 paid note from" + V + "where paid = null and note = null",
    "select top 10 paid note from" + V + "where not (paid = null or note = null)",
    "select top 20 ((issued+'19 years'*1.2) - '1/1/1997') + issued, issued, issued+'1.2 days' from" + V,
    "select top 20 issued + '19 years' + '88 days' + '2 weeks' from" + V,
    "select top 20 distinct day(issued) dayofweek(issued) dayofmonth(issued) hour(issued) "
    "dayname(issued) dayofyear(issued) week(issued+'8 weeks') month(issued) monthname(issued) "
    "year(issued) issued abs(count - 40) as abs from" + V,
    "select top 20 from" + V + "order by state",
    "select monthname(issued) dayname(issued) week(issued) sum(ticket) state from" + V
    + "group by month(issued) week(issued) order by state asc",
    "select max(ticket) as max min(ticket) as min sum(ticket) as sum avg(ticket) as avg "
    "count(ticket) as cnt ticket from" + V,
    "select count(fine) state from" + V + "group by state",
    "select top 5 count(fine) state * from" + V + "group by state",
    "select state vtype max(ticket) as max min(ticket) as min avg=avg(ticket) caout = count(*) from" + V
    + "group by state vtype",
    "select top 20 count(fine) + count(fee) count(fine) count(fee) sum(fine+fee) + avg(fine+fee) "
    "issued from" + V + "group by month(issued) order by issued",
    "select count(*) month(issued) from" + V + "group by month(issued) having count(*) between 8 and 100",
    "select distinct state from" + V,
    "select count(distinct state) count(distinct fine) from" + V,
    "select top 20 state from" + V + "where state in (NJ, VA, FL, 78)",
    "select stdev(fine) stdevp(fine) from" + V + "group by state",
    "nh select top 20 from" + C + "c join" + R + "r on c.c3=r.c1",
    "nh select top 20 from" + C + "c join" + R + "r on c.c3+0=r.c1+0",
    "nh select top 20 from" + C + "c bjoin" + R + "r on c.c3=r.c1 order by c.c1",
    "nh select top 20 from" + C + "c sjoin" + R + "r on c.c3=r.c1 order by c.c1",
    "nh select c.c1 r.c2 from" + C + "c left join" + R + "r on c.c3=r.c1",
]

# Round-11 completeness audit vs main_test.go (tests/REFERENCE_BATTERY.md
# maps all 88 reference cases): these close every previously-unmirrored
# GOOD case. Comments carry the reference case number from that table.
GOOD += [
    # 12: searched case with mixed THEN types (bareword/str/int lanes)
    "select top 20 mixpred=case when state like ny then likey "
    "when fine+count < 20 then 'int-flt' when issued < 2017 then datecomp "
    "when count+ticket < 20 then intint end from" + V,
    # 13: simple case with int/float/column/expression comparands
    "select top 20 casexpr=case fine+count*ticket when 23 then inty "
    "when 24.45 then floaty when 23*24.54 then combo when fee then fcol "
    "when count then icol when fee+count then ficol else 234 end from" + V,
    # 14: bareword string concat in THEN (new+york)
    "select top 20 caseexpr=case state when NY then new+york "
    "when MA then massechuestsskjsdlkj when VA then virginia "
    "else flyover end from" + V,
    # 23: date = contradiction (runs, empty result)
    "select top 20 issued from" + V
    + "where issued = '6/14/2017' and issued != '6/14/2017'",
    # 24: between-dates contradiction
    "select top 20 issued from" + V + "where issued between '8/1/2016' "
    "and '10/30/2016' and issued not between '8/1/2016' and '10/30/2016'",
    # 31: CASE = CASE in the predicate
    "select top 20 vtype make case vtype when COM then 1 when OMT then 2 "
    "when PAS then 3 else 4 end case make when TOYOT then 1 when FORD "
    "then 2 when BMW then 3 else 4 end from" + V
    + "where case vtype when COM then 1 when OMT then 2 when PAS then 3 "
    "else 4 end = case make when TOYOT then 1 when FORD then 2 when BMW "
    "then 3 else 4 end",
    # 32: searched case with mixed result types in predicate position
    "select top 10 make count fine issued case when make=TOYOT then 1.2 "
    "when count=36 or fine=30.32 then 48 when issued > 'june 1 1017' "
    "then horse end from" + V + "where case when make=TOYOT then 1.2 "
    "when count=36 or fine=30.32 then 48 when issued > 'june 1 1017' "
    "then horse end = 48",
    # 36/37: literal numbers + cN addressing, default and c modes
    "select top 5 1 2 3 '1' '2' '3' c1 c2 c3 from" + V,
    "c select top 5 1 2 3 '1' '2' '3' c1 c2 c3 from" + V,
    # 38: column = column disjunction (incl. null-y columns)
    "select top 20 fine fee paid note from" + V
    + "where fine = fee or paid = note",
    # 43: BETWEEN over float/int/string/bareword operand mixes
    "select fine count ticket 'and' vtype 'and' make vtype zip from" + V
    + "where fine between count and ticket and vtype between COM and PAS "
    "and make between vtype and zip",
    # 46/49: xor / not xor (and/or/not-and/not-or are in the list above)
    "select top 10 paid note from" + V + "where paid = null xor note = null",
    "select top 10 paid note from" + V
    + "where not (paid = null xor note = null)",
    # 57: c-mode numeric column refs vs null and '' (both null-token forms)
    "c select top 2000 4 9 from" + V
    + "where 4=null and 9<>null and 4='' and 9!=''",
    # 59/60: int = null; float = null and <> null
    "select top 20 paid from" + V + "where paid = null",
    "select top 20 fine fee from" + V + "where fine = null and fee <> null",
    # 78: quoted column name as a function argument in GROUP BY/HAVING
    "select count(*) month('issued') from" + V
    + "group by month('issued') having count(*) between 8 and 100",
    # 83: string column against an int IN-list
    "select top 20 state from" + V
    + "where state in (8479417420, 7813745231, 7536344478)",
    # 86: expression join keys with bareword string concat
    "nh select top 20 from" + C + "c join" + R + "r on c.c1+dog=r.c2+dog",
    # 18: <> relop between two int columns
    "select top 20 count ticket from" + V + "where count <> ticket",
    # 20: like AND not like in one predicate
    "select top 20 state vtype from" + V
    + "where state like ny and vtype not like '%pa%'",
    # 30: or-chain across string/int/float/date comparison types
    "select top 20 plate ticket fee issued from" + V + "where plate = PL1000 "
    "or ticket > 4000000037 or fee > 72.12 or issued > '6/1/2017'",
    # 47: not (... and ...) — the not-or twin is in the list above
    "select top 10 paid note from" + V
    + "where not (paid = null and note = null)",
    # 65: bare non-key column under GROUP BY (last-value-per-group)
    "select max(ticket) as max min(ticket) as min sum(ticket) as sum "
    "avg(ticket) as avg count(ticket) as cnt ticket from" + V
    + "group by state",
    # 82: int column against an int IN-list
    "select top 20 ticket from" + V
    + "where ticket in (4000000000, 4000000007, 4000000019)",
    # 88: plain (non-hinted) ordered join
    "nh select top 20 from" + C + "c join" + R + "r on c.c3=r.c1 "
    "order by c.c1",
]

BAD = [
    # syntax
    "select top 20 case count when 7 then 7.12 else 12.3 end as floaty + 1 from" + V,
    "select top 20 plate" + V + "where count % 2 = 0",
    "select top 20 plate from" + V + "where (plate = PL1 or plate)",
    "select top 20 plate from" + V + "where (plate = PL1) and",
    "select top 20 plate from" + V + "where (plate = PL1",
    # semantics
    "select top 20 issued+issued from" + V,
    "select top 20 issued*count from" + V,
    "select top 20 plate*8 from" + V,
    "select top 20 plate*vtype from" + V,
    "select top 20 count from" + V + "where count % 2.1 = 0",
    "select top 20 count(*), day(issued) from" + V + "group by day(count)",
    "select top 20 count(*), day(issued) from" + V + "group by day(plate)",
    "select top 20 max(min(fine)) from" + V,
    "select top 20 max(fine)+fee*4 from" + V,
    "select top 20 max(fine)*(fee+5) from" + V,
    "select top 20 from" + V + "where max(fine) between min(fine) and fee",
    "select top 20 from" + V + "where fine between max(fine) and max(fee)",
    "select top 20 case fine when fee then a when max(fee) then b end from" + V,
    "select top 20 case max(fine) when fee then a end from" + V,
    "select top 20 case fine when fee then a else max(fee) end from" + V,
    "select format(fine) from" + V,
    "select top 20 from '/nonexistent/file.csv'",
    "nh select top 20 from" + C + "c join" + R + "r on c.c3=r.c1 and c.c3=r.c2",
    "nh select top 20 from" + C + "c join" + R + "r on c.c3=r.c1+c.c3",
]

# Round-11 audit additions (reference case numbers per REFERENCE_BATTERY.md)
BAD += [
    # 58: null literal in arithmetic (c-mode) — "cant multiply null"
    "c select top 2000 4 9 from" + V + "where 4=null*2",
    # 71/73: the two BETWEEN agg-placement variants not yet mirrored
    # (mixed agg/plain bounds in each slot; 70/72 are in the list above)
    "select top 20 from" + V + "where max(fine) between fine and max(fee)",
    "select top 20 from" + V + "where fine between fine and max(fee)",
    # 76: simple-case agg comparand against plain WHEN comparands
    "select top 20 case max(fine) when fee then a when fee then b end from" + V,
    # 84: unknown alias in a join predicate (reference: l.c1)
    "nh select top 20 from" + C + "c join" + R + "r on c.c3=r.c1 and c.c3=l.c1",
    # 28: dangling predicate EXPRESSION after a logop
    "select top 20 plate from" + V + "where (plate = PL1000) and plate+dog",
    # 75: agg simple-case comparand with a mixed agg/plain WHEN list
    "select top 20 case max(fine) when fee then a when max(fee) then b "
    "end from" + V,
]


@pytest.mark.parametrize("qtext", GOOD, ids=lambda s: s[:60])
def test_good_queries_run(eng, qtext):
    rows = eng.sql(qtext).collect()
    assert rows is not None


@pytest.mark.parametrize("qtext", BAD, ids=lambda s: s[:60])
def test_bad_queries_rejected(eng, qtext):
    with pytest.raises(DialectError):
        df = eng.sql(qtext)
        df.collect()  # some errors can only surface at plan time


# --- golden-value checks (beyond the reference's error/success-only bar) --


def test_projection_values(eng):
    rows = eng.sql(
        "select top 3 plate fine+fee as total from" + V + "where state = NY order by plate asc"
    ).collect()
    assert [r.plate for r in rows] == ["PL1001", "PL1006", "PL1008"]
    assert all(abs(r.total - r.total) < 1e-9 for r in rows)


def test_int_division_truncates(eng):
    rows = eng.sql("select count/2 as h count from" + V + "limit 200").collect()
    for r in rows:
        if r["count"] is not None:
            assert r.h == int(r["count"]) // 2 if r["count"] >= 0 else r.h


def test_count_returns_float(eng):
    df = eng.sql("select count(*) as n from" + V)
    assert dict(df.dtypes)["n"] == "double"
    assert df.first().n == 200.0


def test_null_tokens_are_null(eng):
    rows = eng.sql("select paid note from" + V).collect()
    assert any(r.paid is None for r in rows)
    assert any(r.note is None for r in rows)


def test_null_eq_semantics(eng):
    n_null = eng.sql("select plate from" + V + "where note = null").count()
    n_not = eng.sql("select plate from" + V + "where note != null").count()
    assert n_null > 0 and n_null + n_not == 200


def test_leading_zero_zip_stays_string(eng):
    df = eng.sql("select zip from" + V + "limit 1")
    assert dict(df.dtypes)["zip"] == "string"
    assert df.first().zip.startswith("0")


def test_distinct_keeps_first_row(eng):
    rows = eng.sql("select distinct state plate from" + V).collect()
    states = [r.state for r in rows]
    assert len(states) == len(set(states)) == 5
    # first row in file order for NY is PL1001 (row 2 of the fixture)
    ny = next(r for r in rows if r.state == "NY")
    assert ny.plate == "PL1001"


def test_distinct_hidden_drops_column(eng):
    # 'distinct hidden expr' dedups on the expr but omits it from output
    # (parser.go:243-251, tok3 bit 2)
    df = eng.sql("select distinct hidden state plate from" + V)
    assert df.columns == ["plate"]
    assert df.count() == 5  # one first-row per state


def test_inc_rejected_in_aggregate_query(eng):
    from csvtool_spark.dialect.errors import SemanticError

    with pytest.raises(SemanticError):
        eng.sql("select inc() state count(*) from" + V + "group by state")


def test_inc_in_order_by(eng):
    # order by inc() must provision the scan rowid, not crash unresolved
    rows = eng.sql("select plate from" + V + "order by inc() asc limit 3").collect()
    base = eng.sql("select plate from" + V + "limit 3").collect()
    assert [r.plate for r in rows] == [r.plate for r in base]


def test_inc_rejected_in_where_and_having(eng):
    from csvtool_spark.dialect.errors import SemanticError

    with pytest.raises(SemanticError, match="where"):
        eng.sql("select plate from" + V + "where inc() < 3")
    with pytest.raises(SemanticError, match="having"):
        eng.sql(
            "select state count(*) as n from" + V
            + "group by state having inc() > 1"
        )


def test_order_by_defaults_desc(eng):
    rows = eng.sql("select fine from" + V + "order by fine limit 3").collect()
    vals = [r.fine for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_between_halfopen_dialect(eng):
    rows = eng.sql("select fine from" + V + "where fine between 100 and 200").collect()
    assert all(100 <= r.fine < 200 for r in rows)


def test_date_plus_duration(eng):
    rows = eng.sql("select issued issued+'30 days' as due from" + V + "limit 5").collect()
    for r in rows:
        assert (r.due - r.issued).days == 30


def test_week_quirk(eng):
    rows = eng.sql("select issued week(issued) as wk from" + V + "limit 20").collect()
    for r in rows:
        assert r.wk == r.issued.timetuple().tm_yday // 7


def test_join_values(eng, spark):
    rows = eng.sql(
        "nh select c.c1 r.c2 from" + C + "c join" + R + "r on c.c3 = r.c1"
    ).collect()
    assert len(rows) == 20
    for r in rows:
        # headerless files name columns col1..colN (utils.go:420-427)
        assert r.col2.startswith("region")


def test_left_join_nulls(eng):
    # regions 0..6 all match; add a filter to force unmatched rows
    rows = eng.sql(
        "nh select c.c1 r.c2 from" + C + "c left join" + R + "r on c.c3 = r.c1"
    ).collect()
    assert len(rows) == 20


def test_mixed_header_join(eng):
    # per-file noheader: base has a header, join file does not
    df = eng.sql(
        "select v.state c.c1 from" + V + "as v join" + C
        + "nh as c on v.count = c.c3"
    )
    assert df.columns == ["state", "col1"]
    assert df.count() > 0


def test_group_agg_values(eng, spark):
    rows = eng.sql(
        "select state sum(fine) as s count(*) as n from" + V + "group by state"
    ).collect()
    assert sum(r.n for r in rows) == 200.0
    total = eng.sql("select sum(fine) as s from" + V).first().s
    assert abs(sum(r.s for r in rows) - total) < 1e-6


def test_multi_statement_run(eng):
    dfs = eng.run(
        "select top 3 plate from" + V + "; select top 2 state from" + V
    )
    assert len(dfs) == 2
    assert len(dfs[0].collect()) == 3
    assert len(dfs[1].collect()) == 2


def test_csv_sink_roundtrip(eng, tmp_path):
    out = str(tmp_path / "out.csv")
    written = eng.save_csv("select top 5 plate fine from" + V, out)
    assert written == [out]
    with open(out) as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "plate,fine"
    assert len(lines) == 6

    multi = eng.save_csv(
        "select top 2 plate from" + V + "; select top 2 state from" + V,
        str(tmp_path / "m.csv"),
    )
    assert [os.path.basename(p) for p in multi] == ["m-1.csv", "m-2.csv"]


def test_csv_dir_and_parquet_sinks(eng, spark, tmp_path):
    out = eng.save_csv_dir(
        "select plate state fine from" + V, str(tmp_path / "d"), partition_by=["state"]
    )
    back = spark.read.option("header", True).csv(out[0])
    assert back.count() == 200
    assert set(back.columns) == {"plate", "state", "fine"}

    pq = eng.save_parquet("select top 10 plate fine from" + V, str(tmp_path / "p"))
    assert spark.read.parquet(pq[0]).count() == 10


def test_multiline_csv_and_int64_overflow_inference(eng):
    # 'ml' file option: quoted fields with embedded newlines/commas; a
    # 20-digit value widens the column to FLOAT (Go Atoi would overflow)
    df = eng.sql(
        f"select id note amount from '{DATA}/multiline.csv' ml order by id asc"
    )
    rows = df.collect()
    assert rows[0].note == "line one\nline two"
    assert rows[2].note == "a,b,c"
    assert dict(df.dtypes)["amount"] == "double"
    assert rows[2].amount == 1e20


def test_registered_table(eng, spark):
    eng.register("lineitem", spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"))
    df = eng.sql(
        "select l_returnflag sum(l_quantity) as q from lineitem group by l_returnflag"
    )
    assert df.count() == 3


def test_inc_function(eng):
    rows = eng.sql("select inc() plate from" + V + "limit 4").collect()
    assert [r.col1 for r in rows] == [1.0, 2.0, 3.0, 4.0]


def test_encrypt_decrypt_dialect(eng):
    rows = eng.sql(
        "select plate decrypt(encrypt(plate, 'pw'), 'pw') as rt from" + V + "limit 3"
    ).collect()
    for r in rows:
        assert r.rt == r.plate


def test_encrypt_password_must_be_single_literal(eng):
    from csvtool_spark.dialect.errors import SemanticError

    # a literal-only EXPRESSION is not a password token (compiler reads
    # Lit.raw) — must be a clean SemanticError, not an AttributeError
    with pytest.raises(SemanticError, match="literal"):
        eng.sql("select encrypt(plate, 'a' + 'b') from" + V + "limit 1")


def test_cli_output_dispatches_parquet_by_extension(eng, spark, tmp_path, monkeypatch, capsys):
    from csvtool_spark import cli
    from csvtool_spark import session as sess

    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)
    out = str(tmp_path / "res.parquet")
    rc = cli.main(["-c", "select top 5 plate fine from" + V, "-o", out])
    assert rc == 0
    assert capsys.readouterr().out.strip() == out
    back = spark.read.parquet(out)
    assert back.columns == ["plate", "fine"] and back.count() == 5


def test_encrypt_prompts_via_getpass_in_cli(eng, monkeypatch, capsys):
    """Password-less encrypt()/decrypt() prompts in the CLI (reference
    parity: parser.go:979-1007) and round-trips; the provider is cleared
    afterward so programmatic paths stay strict (VERDICT r3 #6)."""
    import getpass as getpass_mod

    from csvtool_spark import cli
    from csvtool_spark.dialect import compiler
    from csvtool_spark.dialect.errors import SemanticError

    prompts = []

    def fake_getpass(prompt=""):
        prompts.append(prompt)
        return "s3cret"

    monkeypatch.setattr(getpass_mod, "getpass", fake_getpass)
    rc = cli.main(
        ["-c", "select decrypt(encrypt(plate), 's3cret') as rt from" + V + "limit 3"]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert lines[0] == "rt" and len(lines) == 4  # header + 3 round-tripped rows
    assert prompts and "encrypt() password" in prompts[0]
    # provider cleared: in-process engine use is strict again
    assert compiler.PASSWORD_PROVIDER is None
    with pytest.raises(SemanticError, match="password"):
        eng.sql("select encrypt(plate) from" + V + "limit 1")


def test_csv_sink_bare_name_gets_csv_extension(eng, tmp_path):
    """A bare -o name gets '.csv' appended in BOTH branches (reference
    pathChecker rule, files.go:173-178) — the CLI lane calls save_csv
    without the server's check_save_path, and round-11's second review
    caught 'out' (one statement) vs 'out-1.csv' (two) inconsistency."""
    single = eng.save_csv("select top 2 plate from" + V,
                          str(tmp_path / "bare"))
    assert [os.path.basename(p) for p in single] == ["bare.csv"]
    multi = eng.save_csv(
        "select top 2 plate from" + V + "; select top 2 state from" + V,
        str(tmp_path / "bare2"),
    )
    assert [os.path.basename(p) for p in multi] == [
        "bare2-1.csv", "bare2-2.csv"
    ]
