"""Op-tree grammar unit tests (SURVEY Q1-Q9 surface)."""

import pytest

from oscar_spatial_index_compare_spark.plans.optree import Node, parse


def s(n):
    return repr(n)


def test_leaves():
    assert s(parse("join")) == "(token 'join' 'exact')"
    assert s(parse("jo*")) == "(token 'jo' 'prefix')"
    assert s(parse("*in")) == "(token 'in' 'suffix')"
    assert s(parse("*oi*")) == "(token 'oi' 'substring')"
    assert s(parse("$region:3")) == "(region 3)"
    assert s(parse("$cell:42")) == "(cell 42)"
    assert s(parse("$poly:metro")) == "(poly 'metro')"


def test_precedence_and_adjacency():
    # bare adjacency == '/'
    assert s(parse("a b")) == s(parse("a / b"))
    # intersection binds tighter than +,-,^
    assert s(parse("a b + c")) == "(union (inter (token 'a' 'exact') (token 'b' 'exact')) (token 'c' 'exact'))"
    # left assoc chain
    assert s(parse("a + b - c")) == "(diff (union (token 'a' 'exact') (token 'b' 'exact')) (token 'c' 'exact'))"


def test_parens_and_fm():
    n = parse("!(a + b) / c")
    assert s(n) == "(inter (fm (union (token 'a' 'exact') (token 'b' 'exact'))) (token 'c' 'exact'))"


def test_errors():
    with pytest.raises(ValueError):
        parse("(a + b")
    with pytest.raises(ValueError):
        parse("a + ")
    with pytest.raises(ValueError):
        parse("a & b")


def test_unspaced_difference_lexes_as_operator():
    # ADVICE r01: 'a-b' must be (diff a b), not a single leaf token
    n = parse("a-b")
    assert n.op == "diff"
    assert n.args[0] == Node("token", ("a", "exact"))
    assert n.args[1] == Node("token", ("b", "exact"))
    assert parse("join-dup+spark").op == "union"


def test_dollar_leaf_errors_are_parse_errors():
    # ADVICE r03: a bare '$' must raise ValueError, not AttributeError
    with pytest.raises(ValueError, match=r"\$-leaf"):
        parse("$ + dup")
    # '-' is swallowed into $-payloads; the payload validator must reject it
    # with a clear message (not a confusing int() ValueError)
    with pytest.raises(ValueError, match="region"):
        parse("$region:1-2")
    with pytest.raises(ValueError, match="rect"):
        parse("$rect:1,2,3")
    with pytest.raises(ValueError, match="rect"):
        parse("$rect:a,b,c,d")
    with pytest.raises(ValueError, match="unknown"):
        parse("$bogus:1")
    # spaced difference after a $-leaf still parses
    n = parse("$region:1 - 2")
    assert n.op == "diff"
    # plain token leaves are unaffected: unspaced '-' is still a difference
    assert parse("a-b").op == "diff"
