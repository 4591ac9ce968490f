"""Result column-name parity (reference tests/query_tests.rs
test_colnames :1818-1848 via the test_query_colnames harness :135-156).

The reference derives result colnames by echoing the select expression's
AST Display (parser.rs:143: ``strip_quotes(&format!("{}", e))``) — spaces
around binary operators, function-name case preserved as written, aliases
win. We reproduce that in ``expr_name`` (dialect/compiler.py)."""


def colnames(db, q):
    return db.run_query(q)["colnames"]


def test_expression_colname(db_ec):
    assert colnames(
        db_ec, "SELECT non_dense_ints + negative - 2 FROM default;"
    ) == ["non_dense_ints + negative - 2"]


def test_aggregate_colname_preserves_case(db_ec):
    assert colnames(db_ec, "SELECT SUM(u8_offset_encoded) FROM default;") == [
        "SUM(u8_offset_encoded)"]
    assert colnames(db_ec, "SELECT sum(u8_offset_encoded) FROM default;") == [
        "sum(u8_offset_encoded)"]


def test_alias_colname(db_ec):
    assert colnames(db_ec, "SELECT COUNT(1) as cnt FROM default;") == ["cnt"]


def test_plain_colname(db_ec):
    assert colnames(
        db_ec,
        "SELECT u8_offset_encoded FROM default WHERE u8_offset_encoded = 256;"
    ) == ["u8_offset_encoded"]


def test_quoted_colname_stripped(db_ec):
    # quoted identifiers are stripped in output names (parser.rs strip_quotes)
    assert colnames(
        db_ec,
        'SELECT "u8_offset_encoded" FROM "default" '
        'WHERE "u8_offset_encoded" = 256;') == ["u8_offset_encoded"]


def test_meta_tables_colnames(db_ec):
    assert colnames(
        db_ec, "SELECT name, COUNT(1) AS c, timestamp FROM _meta_tables;"
    ) == ["name", "c", "timestamp"]


def test_scalar_function_colnames(db_ec):
    # parser.rs:479 shows Func colnames echo the written form
    assert colnames(
        db_ec, "SELECT to_year(id), length(country), count(0) FROM default;"
    ) == ["to_year(id)", "length(country)", "count(0)"]


def test_division_colname(db_ec):
    assert colnames(db_ec, "SELECT id / 5, count(0) FROM default;") == [
        "id / 5", "count(0)"]
