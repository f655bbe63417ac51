"""Unit pins for the registration-time NaN cast guard (nanpin.py).

The pass rewrites every oracle's measure→fixed-width casts into the
NaN→NULL guard; these tests pin its invariants so a future edit can't
silently widen or narrow the wrap set.
"""

from etl_builder_spark.nanpin import pin_nan_casts


def test_wraps_decimal_and_integral_targets():
    out = pin_nan_casts("SELECT CAST(x AS DECIMAL(18,2)), CAST(a+b AS BIGINT) FROM t")
    assert "CASE WHEN isnan(x) THEN NULL ELSE x END" in out
    assert "CASE WHEN isnan(a+b) THEN NULL ELSE a+b END" in out


def test_skips_double_target_and_count_source():
    sql = "SELECT CAST(x AS DOUBLE), CAST(COUNT(*) AS BIGINT) FROM t"
    assert pin_nan_casts(sql) == sql


def test_skips_boolean_and_string_sources():
    sql = (
        "SELECT CAST(x < q80 AS INT), CAST(substr(n,1,3) AS BIGINT), "
        "CAST(concat('0x', h) AS BIGINT) FROM t"
    )
    assert pin_nan_casts(sql) == sql


def test_try_cast_untouched():
    sql = "SELECT TRY_CAST(x AS BIGINT) FROM t"
    assert pin_nan_casts(sql) == sql


def test_idempotent():
    once = pin_nan_casts("SELECT CAST(x AS DECIMAL(18,2)) FROM t")
    assert pin_nan_casts(once) == once


def test_nested_cast_inner_guarded():
    out = pin_nan_casts(
        "SELECT CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) FROM t"
    )
    assert out == (
        "SELECT CAST(SUM(CAST((CASE WHEN isnan(x) THEN NULL ELSE x END)"
        " AS DECIMAL(18,2))) AS DOUBLE) FROM t"
    )


def test_quoted_parens_do_not_break_depth():
    out = pin_nan_casts("SELECT CAST(instr(s, '(') AS BIGINT) FROM t")
    assert "isnan(instr(s, '('))" in out


def test_comments_do_not_break_scoping():
    # ADVICE r13: '--' comments must not mis-scope the scan.  A literal
    # CAST( inside a comment is not a cast site; an apostrophe or an
    # unbalanced paren in a comment must not derail depth/quote state.
    sql = (
        "SELECT -- CAST(junk AS BIGINT) isn't ( a real cast\n"
        "CAST(x AS DECIMAL(18,2)) FROM t"
    )
    out = pin_nan_casts(sql)
    assert "CASE WHEN isnan(x) THEN NULL ELSE x END" in out
    assert out.count("isnan") == 1
    sql2 = "SELECT /* CAST( ' ) */ CAST(y AS BIGINT) FROM t"
    out2 = pin_nan_casts(sql2)
    assert "CASE WHEN isnan(y) THEN NULL ELSE y END" in out2
    assert out2.count("isnan") == 1


def test_comment_inside_wrapped_expr_is_masked():
    # the guard inlines expr twice on one line, so a '--' comment inside
    # a wrapped expr must not survive into the guard (it would comment
    # out the THEN/ELSE tail); the mask turns it into spaces
    sql = "SELECT CAST(x -- note\n + y AS BIGINT) FROM t"
    out = pin_nan_casts(sql)
    assert "--" not in out
    assert "THEN NULL ELSE" in out
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW t AS SELECT 1.5::DOUBLE x, 2.0::DOUBLE y")
    assert con.execute(out).fetchone()[0] == 4


def test_quoted_identifiers_do_not_start_comments():
    # ADVICE r14: a literal `--` or `/*` inside a "double-quoted"
    # identifier is NOT a comment start; masking it would desynchronize
    # the positional CAST scan.  "" is the escaped quote.
    sql = 'SELECT CAST("a--b" AS BIGINT), CAST("c/*d""e" AS DECIMAL(18,2)) FROM t'
    out = pin_nan_casts(sql)
    assert out.count("isnan") == 2
    assert '"a--b"' in out and '"c/*d""e"' in out


def test_registry_oracles_all_parse():
    """Every registered oracle (already pinned at registration) binds
    in DuckDB against empty views of the ten tables — the pass can
    never emit unparseable or unbindable SQL."""
    import duckdb

    from etl_builder_spark.registry import REGISTRY, _ensure_loaded
    from etl_builder_spark.session import TABLES
    from tests.conftest import SF_DIR

    _ensure_loaded()
    con = duckdb.connect()

    for t in TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}') LIMIT 0"
        )
    bad = []
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            con.execute("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad
