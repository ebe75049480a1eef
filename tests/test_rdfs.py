"""ρDF entailment (operators/rdfs.py) — each rule against hand-derived
closures, the stratification (domain-via-superproperty, superclass over
derived types), cycles, and idempotence."""

from __future__ import annotations

from sigraph_spark.operators.rdfs import rdfs_closure


def _store(spark, rows):
    return spark.createDataFrame(
        rows, "src string, predicate string, dst string")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_subclass_transitivity_and_types(spark):
    t = [("c1", "rdfs:subClassOf", "c0"),
         ("c2", "rdfs:subClassOf", "c1"),
         ("x", "rdf:type", "c2")]
    got = _rows(rdfs_closure(_store(spark, t)))
    assert ("c2", "rdfs:subClassOf", "c0") in got      # rdfs11
    assert ("x", "rdf:type", "c1") in got              # rdfs9
    assert ("x", "rdf:type", "c0") in got              # rdfs9 via closure
    assert set(t) <= got


def test_subproperty_and_domain_range_stratification(spark):
    t = [("p1", "rdfs:subPropertyOf", "p0"),
         ("p0", "rdfs:domain", "D"),
         ("p0", "rdfs:range", "R"),
         ("a", "p1", "b")]
    got = _rows(rdfs_closure(_store(spark, t)))
    assert ("a", "p0", "b") in got                     # rdfs7
    # domain/range of the SUPERproperty reach the subproperty's triple
    assert ("a", "rdf:type", "D") in got               # rdfs2
    assert ("b", "rdf:type", "R") in got               # rdfs3
    # and superclass typing applies to those derived types
    got2 = _rows(rdfs_closure(_store(
        spark, t + [("D", "rdfs:subClassOf", "Top")])))
    assert ("a", "rdf:type", "Top") in got2            # rdfs9 over rdfs2


def test_cycles_converge(spark):
    t = [("a", "rdfs:subClassOf", "b"), ("b", "rdfs:subClassOf", "a"),
         ("x", "rdf:type", "a")]
    got = _rows(rdfs_closure(_store(spark, t)))
    assert ("a", "rdfs:subClassOf", "a") in got
    assert ("x", "rdf:type", "b") in got


def test_idempotent(spark):
    t = [("p1", "rdfs:subPropertyOf", "p0"),
         ("p0", "rdfs:domain", "D"),
         ("D", "rdfs:subClassOf", "Top"),
         ("a", "p1", "b"), ("a", "rdf:type", "D")]
    once = rdfs_closure(_store(spark, t))
    assert _rows(rdfs_closure(once)) == _rows(once)


def test_no_schema_is_identity(spark):
    t = [("a", "knows", "b"), ("x", "rdf:type", "C")]
    assert _rows(rdfs_closure(_store(spark, t))) == set(t)
