"""Property-based tests (hypothesis) for the orchestration layer — the
pure-Python pieces whose input space is combinatorial: dependency
extraction, cycle detection, scheduling. Mirrors and extends the
reference's unit-test strategy (src/main.rs:463-548) with generated
cases instead of three fixtures. No Spark session needed.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from powersql_spark.orchestrator.dag import (
    build_graph,
    detect_cycles,
    get_dependencies,
    topo_order,
)
from powersql_spark.orchestrator.sqlparse import Model, parse_model_file

# Bare SQL keywords aren't legal relation names without quoting; keep
# generated names out of that space (the reference's parser would
# reject them too).
_KEYWORDS = {
    "select", "from", "join", "on", "as", "where", "group", "order",
    "by", "left", "right", "full", "cross", "inner", "outer", "union",
    "and", "or", "not", "in", "is", "null", "case", "when", "then",
    "end", "else", "exists", "with", "view", "table", "create",
    "limit", "having", "distinct", "between", "like", "cast", "assert",
}

names = st.lists(
    st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
        lambda s: s not in _KEYWORDS
    ),
    min_size=1,
    max_size=12,
    unique=True,
)


@st.composite
def random_dags(draw):
    """Random acyclic deps: edges only from earlier to later names in a
    drawn order, so acyclicity holds by construction."""
    ns = draw(names)
    deps = {}
    for i, n in enumerate(ns):
        pool = ns[:i]
        refs = draw(
            st.lists(st.sampled_from(pool), unique=True, max_size=len(pool))
            if pool
            else st.just([])
        )
        deps[n] = refs
    return deps


@given(random_dags())
@settings(max_examples=200, deadline=None)
def test_topo_order_respects_deps(deps):
    order = topo_order(deps)
    assert sorted(order) == sorted(deps)
    pos = {n: i for i, n in enumerate(order)}
    for name, refs in deps.items():
        for r in refs:
            assert pos[r] < pos[name], f"{r} must run before {name}"


@given(random_dags())
@settings(max_examples=200, deadline=None)
def test_detect_cycles_accepts_dags(deps):
    detect_cycles(deps)  # must not raise


@given(random_dags(), st.data())
@settings(max_examples=200, deadline=None)
def test_detect_cycles_rejects_injected_cycle(deps, data):
    """Closing any dependency path back on itself must be detected."""
    with_refs = [n for n, refs in deps.items() if refs]
    if not with_refs:
        deps["a0"] = ["a0"]  # self-loop
    else:
        name = data.draw(st.sampled_from(with_refs))
        # Walk to a root of name's dependency tree, then point it at name.
        cur = deps[name][0]
        seen = {name}
        while deps[cur] and cur not in seen:
            seen.add(cur)
            cur = deps[cur][0]
        deps[cur] = deps[cur] + [name] if cur != name else [name]
    try:
        detect_cycles(deps)
    except ValueError as e:
        assert "Cycle" in str(e)
    else:
        raise AssertionError("cycle not detected")


@given(random_dags())
@settings(max_examples=200, deadline=None)
def test_build_graph_degrees_consistent(deps):
    graph = build_graph(deps)
    assert set(graph) == set(deps)
    for name, refs in deps.items():
        assert graph[name].live_parents == len(refs)
    # Sum of in-degrees == sum of out-degrees == number of edges.
    n_edges = sum(len(r) for r in deps.values())
    assert sum(g.live_parents for g in graph.values()) == n_edges
    assert sum(len(g.next_nodes) for g in graph.values()) == n_edges


@given(random_dags())
@settings(max_examples=100, deadline=None)
def test_parse_roundtrip_models_and_deps(deps):
    """Generate a model file whose FROM/JOIN clauses encode ``deps``
    exactly; parsing + extraction must reproduce them. External tables
    (never defined as models) must be filtered out of the DAG, like the
    reference does (src/main.rs:221)."""
    stmts = []
    for name, refs in deps.items():
        if not refs:
            sql = f"CREATE VIEW {name} AS SELECT 1 AS c FROM ext_src"
        else:
            first, *rest = refs
            joins = " ".join(f"JOIN {r} ON 1 = 1" for r in rest)
            sql = f"CREATE VIEW {name} AS SELECT 1 AS c FROM {first} {joins}"
        stmts.append(sql)
    models = parse_model_file(";\n".join(stmts) + ";")
    assert set(models) == set(deps)
    assert all(isinstance(m, Model) for m in models.values())
    extracted = get_dependencies(models)
    assert {n: sorted(r) for n, r in extracted.items()} == {
        n: sorted(r) for n, r in deps.items()
    }
