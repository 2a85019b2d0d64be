"""SPARQL 1.1 Update (kg/update.py): INSERT/DELETE DATA, DELETE-INSERT
WHERE pre-state semantics, transactional snapshot application."""

from __future__ import annotations

import pytest

from rdf_tabular_spark.kg.update import (
    delete_data,
    delete_insert,
    insert_data,
    transactional_update,
)

T = [
    ("f:a", "p", "o1", False, "xsd:string", None),
    ("f:a", "q", "o1", True, None, None),
    ("f:b", "p", "o2", False, None, "en"),
    ("m:x", "type", "Module", True, None, None),
]

SCHEMA = ("subj string, pred string, obj string, obj_is_iri boolean, "
          "obj_datatype string, obj_lang string")


def _g(spark, rows=None):
    return spark.createDataFrame(rows or T, SCHEMA)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_insert_data_set_semantics_existing_wins(spark):
    new = _g(spark, [
        ("f:c", "p", "o3", False, None, None),
        # same (s,p,o) as an asserted row but different metadata: the
        # asserted row's datatype must survive
        ("f:a", "p", "o1", True, None, None),
    ])
    out = insert_data(_g(spark), new)
    assert out.count() == len(T) + 1
    kept = out.filter("subj = 'f:a' and pred = 'p'").collect()[0]
    assert kept.obj_datatype == "xsd:string" and kept.obj_is_iri is False


def test_delete_data_by_key_absent_is_noop(spark):
    gone = _g(spark, [
        ("f:a", "p", "o1", True, None, None),      # metadata ignored
        ("f:z", "p", "zzz", False, None, None),    # absent: no-op
    ])
    out = delete_data(_g(spark), gone)
    assert _rows(out) == _rows(_g(spark, [r for r in T
                                          if r[:3] != ("f:a", "p", "o1")]))


def test_delete_insert_where_pre_state_rename(spark):
    # rename p -> q; f:a ALREADY has a q triple with the same object:
    # set semantics merge them, and the pre-existing q row's metadata
    # wins over the inserted one
    out = delete_insert(
        _g(spark),
        where=[("?s", "p", "?o")],
        delete_templates=[("?s", "p", "?o")],
        insert_templates=[("?s", "q", "?o", False)],
    )
    got = _rows(out.select("subj", "pred", "obj"))
    assert got == sorted([
        ("f:a", "q", "o1"), ("f:b", "q", "o2"), ("m:x", "type", "Module")])
    merged = out.filter("subj = 'f:a' and pred = 'q'").collect()
    assert len(merged) == 1 and merged[0].obj_is_iri is True


def test_delete_insert_requires_a_template(spark):
    with pytest.raises(ValueError, match="at least one template"):
        delete_insert(_g(spark), where=[("?s", "p", "?o")])


def test_delete_only_and_insert_only(spark):
    only_del = delete_insert(_g(spark), [("?s", "p", "?o")],
                             delete_templates=[("?s", "p", "?o")])
    assert only_del.filter("pred = 'p'").count() == 0
    only_ins = delete_insert(_g(spark), [("?s", "p", "?o")],
                             insert_templates=[("?s", "seen", "true", False)])
    assert only_ins.count() == len(T) + 2


def test_transactional_update_snapshot_roundtrip(spark, tmp_path):
    from rdf_tabular_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "g"))
    t.commit(_g(spark), mode="overwrite")
    sid = transactional_update(
        t, spark,
        lambda g: delete_insert(g, [("?s", "p", "?o")],
                                delete_templates=[("?s", "p", "?o")],
                                insert_templates=[("?s", "q", "?o", False)]))
    assert sid == 2
    assert t.read(spark).filter("pred = 'p'").count() == 0
    # the pre-update graph is still time-travelable
    assert t.read(spark, 1).filter("pred = 'p'").count() == 2


def test_transactional_update_aborts_on_concurrent_commit(spark, tmp_path):
    from rdf_tabular_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "g"))
    t.commit(_g(spark), mode="overwrite")

    def racing_fn(g):
        # a concurrent writer lands between our read and our publish
        t.commit(_g(spark, [("f:new", "p", "x", False, None, None)]))
        return delete_data(g, _g(spark))

    with pytest.raises(RuntimeError, match="parent moved"):
        transactional_update(t, spark, racing_fn)


# --- graph management (CLEAR / DROP / ADD / COPY / MOVE, spec §3.2) ------

QSCHEMA = "graph string, " + SCHEMA

Q = [
    (None, "d:s", "p", "shared", False, None, None),
    (None, "d:s", "q", "shared2", True, None, None),
    ("g:1", "f:a", "p", "o1", False, "xsd:string", None),
    ("g:1", "f:a", "q", "o2", True, None, None),
    ("g:2", "f:a", "p", "o1", True, None, None),   # same (s,p,o) as g:1's
    ("g:2", "f:b", "p", "o3", False, None, "en"),
]


def _q(spark, rows=None):
    return spark.createDataFrame(rows or Q, QSCHEMA)


def _qrows(df):
    return sorted((tuple("\0" if v is None else v for v in r), tuple(r))
                  for r in df.collect())


def test_clear_named_graph_keeps_default_nulls(spark):
    from rdf_tabular_spark.kg.update import clear_graph

    out = clear_graph(_q(spark), "g:1")
    # the default graph's NULL rows must survive the negated selector
    assert _qrows(out) == _qrows(_q(spark, [r for r in Q if r[0] != "g:1"]))


def test_clear_default_named_all(spark):
    from rdf_tabular_spark.kg.update import clear_graph

    assert _qrows(clear_graph(_q(spark), None)) == \
        _qrows(_q(spark, [r for r in Q if r[0] is not None]))
    assert _qrows(clear_graph(_q(spark), "NAMED")) == \
        _qrows(_q(spark, [r for r in Q if r[0] is None]))
    assert clear_graph(_q(spark), "ALL").count() == 0


def test_add_existing_destination_rows_win(spark):
    from rdf_tabular_spark.kg.update import add_graph

    out = add_graph(_q(spark), "g:1", "g:2")
    g2 = {(r.subj, r.pred, r.obj): r
          for r in out.filter("graph = 'g:2'").collect()}
    # g:2 already held (f:a, p, o1) with obj_is_iri=True — it wins
    assert g2[("f:a", "p", "o1")].obj_is_iri is True
    # g:1's other row arrives with its metadata
    assert g2[("f:a", "q", "o2")].obj_is_iri is True
    assert len(g2) == 3
    # source unchanged
    assert out.filter("graph = 'g:1'").count() == 2


def test_add_from_default_to_named_null_key_merge(spark):
    from rdf_tabular_spark.kg.update import add_graph

    # also exercises the reverse: ADD DEFAULT TO g:1 twice is idempotent
    once = add_graph(_q(spark), None, "g:1")
    twice = add_graph(once, None, "g:1")
    assert _qrows(once) == _qrows(twice)
    assert once.filter("graph = 'g:1'").count() == 4


def test_copy_replaces_destination(spark):
    from rdf_tabular_spark.kg.update import copy_graph

    out = copy_graph(_q(spark), "g:1", "g:2")
    assert _qrows(out.filter("graph = 'g:2'").drop("graph")) == \
        _qrows(_q(spark).filter("graph = 'g:1'").drop("graph"))
    assert out.filter("graph = 'g:1'").count() == 2


def test_move_drops_source(spark):
    from rdf_tabular_spark.kg.update import move_graph

    out = move_graph(_q(spark), "g:2", None)
    assert out.filter("graph = 'g:2'").count() == 0
    # destination (default graph) now holds exactly g:2's old data
    assert _qrows(out.filter("graph is null").drop("graph")) == \
        _qrows(_q(spark).filter("graph = 'g:2'").drop("graph"))


def test_self_add_copy_move_are_noops(spark):
    from rdf_tabular_spark.kg.update import add_graph, copy_graph, move_graph

    for fn in (add_graph, copy_graph, move_graph):
        assert _qrows(fn(_q(spark), "g:1", "g:1")) == _qrows(_q(spark))
