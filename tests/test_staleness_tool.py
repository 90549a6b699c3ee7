"""Unit coverage for tools/staleness.py's static analysis — the parts
that must stay correct for the driver-window changed tier to be
derived rather than hand-listed (r8 verdict ask #1). The git-walking
end-to-end path runs in the round-close ritual; here we pin the
resolution semantics that broke during development:

* relative-import stripping for MODULES vs package __init__ (the bug
  that hid every `from . import qsum` consumer on the first run),
* free-name extraction excluding locals/params/builtins,
* segment-local imports resolved as real dependencies,
* closure reachability through module aliases.
"""

import sys

sys.path.insert(0, "/root/repo")

from tools.staleness import (  # noqa: E402
    ModuleIndex, _refs_in, closure_parts, changed_deps, query_sources,
)


def test_refs_in_excludes_bound_names_and_builtins():
    names, attrs, imports = _refs_in(
        "def f(a, b=2):\n"
        "    c = a + helper(b)\n"
        "    xs = [y for y in c if y]\n"
        "    return float(c) + CONST + mod.attr_fn(c)\n"
    )
    assert "helper" in names and "CONST" in names
    # params, locals, comprehension vars, builtins: not dependencies
    for bound in ("a", "b", "c", "xs", "y", "float", "f"):
        assert bound not in names, bound
    assert attrs == {"mod": {"attr_fn"}}
    assert imports == []


def test_refs_in_returns_segment_local_imports():
    names, attrs, imports = _refs_in(
        "def f():\n"
        "    from ..lib.graphs import page_rank_int\n"
        "    from . import qsum as q\n"
        "    return page_rank_int(q.x)\n"
    )
    # aliases are bound (not free names) but surface as import deps
    assert "page_rank_int" not in names and "q" not in names
    got = {(alias, level, module, orig) for alias, level, module, orig, _
           in imports}
    assert ("page_rank_int", 2, "lib.graphs", "page_rank_int") in got
    assert ("q", 1, "", "qsum") in got


def test_module_relative_import_resolution_strips_module_name():
    """`from . import qsum` inside emma_spark.workloads.relational must
    resolve against emma_spark.workloads (the package), NOT against
    the module itself — the first-run bug that classified every
    rd/qsum consumer as fresh."""
    idx = ModuleIndex(None)
    qid, body, def_mod = idx.resolve("emma_spark.workloads.relational", "qsum")
    assert qid == "emma_spark.workloads.qsum"
    assert def_mod == "emma_spark.workloads"
    assert body and "coalesce" in body  # the r9 two-aggregate form


def test_closure_reaches_shared_helpers_and_oracle():
    idx = ModuleIndex(None)
    qsrc = query_sources(idx)
    mod, seg = qsrc["groupby_agg_pricing"]
    parts = closure_parts(idx, mod, seg)
    assert "emma_spark.workloads.qsum" in parts
    assert "emma_spark.workloads._nonfinite" in parts
    # the decorator segment embeds the oracle SQL in the root
    assert "sum_disc" in parts["__root__"]


def test_changed_deps_detects_one_sided_and_differing():
    old = {"a": "1", "b": "2", "c": "3"}
    new = {"a": "1", "b": "CHANGED", "d": "4"}
    assert changed_deps(old, new) == {"b", "c", "d"}


def test_release_handle_change_marks_graph_queries():
    """The r9 carry_ckpt edit must appear in the fixpoint consumers'
    closures — the property that let the tool catch graph_ppr_seed
    when the hand-derived verdict list missed it."""
    idx = ModuleIndex(None)
    qsrc = query_sources(idx)
    mod, seg = qsrc["graph_transitive_closure"]
    parts = closure_parts(idx, mod, seg)
    assert "emma_spark.plans.iterate.carry_ckpt" in parts
    assert "emma_spark.plans.iterate.fixpoint" in parts
