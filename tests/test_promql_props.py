"""Property-based checks (SURVEY.md §5.4) for the PromQL front end:
the parser must TOTAL-FUNCTION every input (success or PromQLError —
never an internal exception, the HTTP 400-vs-500 contract), and every
grammar-directed random expression must either compile to a DataFrame
with the (labels…, value) shape or reject with a PromQLError. The
compile-time rejection discipline (variable-den aggregation, den
overflow, sqrt fencing, grid restrictions) makes "compiles" a
non-trivial subset — the property drives thousands of operator
combinations the hand-written queries never spell out."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prometheus_remote_kinesis_spark.promql import PromQLError, parse

# --- arbitrary-text fuzz: pure Python, no Spark — fast lane ---------

# printable ASCII + PromQL's own token alphabet + some unicode noise
_noise = st.text(
    alphabet=st.sampled_from(
        list(
            "abcdefghijklmnopqrstuvwxyz0123456789"
            ' _(){}[]<>=!~+-*/%^@:,."\\\t\n'
        )
        + ["日", "€", "\x00"]
    ),
    max_size=60,
)


@given(_noise)
@settings(max_examples=300, deadline=None)
def test_promql_parse_is_total(text):
    """parse() terminates with a result or a PromQLError on ANY input —
    the server's 400 bad_data contract (an internal exception would
    surface as a 500)."""
    try:
        parse(text)
    except PromQLError:
        pass


# --- grammar-directed fuzz: random well-formed-ish expressions -----

_metric = st.sampled_from(["click", "view", "purchase", "error"])
_window = st.sampled_from(["5m", "1h", "1d", "30d"])
_matchers = st.sampled_from(
    ["", '{user="1"}', '{user!="1"}', '{user=~"1.*"}', '{user!~"^$"}']
)
_modifiers = st.sampled_from(["", " offset 5m", " @ 1705276800",
                              " offset 1h @ 1705276800"])
_rangefn = st.sampled_from([
    "rate", "increase", "delta", "avg_over_time", "sum_over_time",
    "count_over_time", "min_over_time", "max_over_time", "last_over_time",
    "present_over_time", "stddev_over_time", "stdvar_over_time",
    "changes", "resets", "idelta", "irate",
])
_aggop = st.sampled_from(["sum", "min", "max", "count", "avg",
                          "group", "stddev", "stdvar"])
_by = st.sampled_from(["", " by (user)", " without (user)"])
_intfn = st.sampled_from(["floor", "ceil", "round", "sgn", "abs"])
_datefn = st.sampled_from(["minute", "hour", "day_of_week", "month",
                           "year", "days_in_month"])
_cmp = st.sampled_from(["<", ">", "<=", ">=", "==", "!="])
_boolmod = st.sampled_from(["", " bool"])
_binop = st.sampled_from(["+", "-", "*", "/"])
_match_clause = st.sampled_from(["", " on(user)", " ignoring()",
                                 " on(user) group_left"])
_scalar = st.sampled_from(["2", "0.5", "40", "7"])


def _sel(draw):
    return (
        draw(_metric) + draw(_matchers) + draw(_modifiers)
    )


@st.composite
def _expr(draw, depth=0):
    # weights: lean on leaves as depth grows so strings stay bounded
    choices = ["rangefn", "selector", "quantile_ot", "timestamp"]
    if depth < 3:
        choices += [
            "agg", "intfn", "datefn", "cmp_scalar", "cmp_vector",
            "scale", "shift", "mod", "pow", "binop", "clamp", "topk",
            "label_join", "paren",
        ]
    kind = draw(st.sampled_from(choices))
    if kind == "selector":
        return _sel(draw)
    if kind == "rangefn":
        return (
            f"{draw(_rangefn)}({_sel(draw)}[{draw(_window)}]"
            f"{draw(_modifiers)})"
        )
    if kind == "quantile_ot":
        return f"quantile_over_time(0.9, {_sel(draw)}[{draw(_window)}])"
    if kind == "timestamp":
        return f"timestamp({_sel(draw)})"
    inner = draw(_expr(depth + 1))
    if kind == "agg":
        return f"{draw(_aggop)}{draw(_by)}({inner})"
    if kind == "intfn":
        return f"{draw(_intfn)}({inner})"
    if kind == "datefn":
        return f"{draw(_datefn)}({inner})"
    if kind == "cmp_scalar":
        return f"{inner} {draw(_cmp)}{draw(_boolmod)} {draw(_scalar)}"
    if kind == "cmp_vector":
        rhs = draw(_expr(depth + 1))
        return (
            f"{inner} {draw(_cmp)}{draw(_boolmod)}"
            f"{draw(_match_clause)} {rhs}"
        )
    if kind == "scale":
        return f"{inner} * {draw(_scalar)}"
    if kind == "shift":
        return f"{inner} - {draw(_scalar)}"
    if kind == "mod":
        return f"{inner} % {draw(_scalar)}"
    if kind == "pow":
        return f"{inner} ^ {draw(st.sampled_from(['0', '1', '2']))}"
    if kind == "binop":
        rhs = draw(_expr(depth + 1))
        return f"{inner} {draw(_binop)}{draw(_match_clause)} {rhs}"
    if kind == "clamp":
        return f"clamp_max({inner}, 100)"
    if kind == "topk":
        return f"topk(3, {inner})"
    if kind == "label_join":
        return f'label_join({inner}, "pair", "-", "user")'
    return f"({inner})"


# Hypothesis battery driving the COMPILER (Spark plan analysis per
# example, ~2 min): slow lane, like the other property batteries.
@pytest.mark.slow
@given(_expr())
@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_promql_compile_is_total_and_shaped(spark, query):
    """Every grammar-directed expression either compiles to a DataFrame
    whose last column is `value` with every other column a label
    (user/t_ms/string labels), or rejects with PromQLError. Plan
    ANALYSIS runs per example (df.columns forces it), so Spark's own
    resolver agrees with the compiled shape — no example is executed."""
    from prometheus_remote_kinesis_spark.promql import compile_promql
    from tests.conftest import SF_SMOKE

    try:
        df = compile_promql(spark, SF_SMOKE, query)
    except PromQLError:
        return
    cols = df.columns
    assert cols[-1] == "value" and len(cols) == len(set(cols))
    assert all(c.isidentifier() for c in cols)
