"""Degree-oriented triangle counting: exact counts on known graphs."""

from __future__ import annotations

from pyspark.sql import Row

from gomrjob_spark.operators.graph import triangle_counts


def _edges(spark, pairs):
    return spark.createDataFrame([Row(a=a, b=b) for a, b in pairs])


def test_k4_counts(spark):
    # K4: 4 triangles, every node in exactly 3
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    got = {r["node"]: r["n_tri"] for r in triangle_counts(_edges(spark, k4)).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_star_and_path_have_no_triangles(spark):
    hub = [(7, leaf) for leaf in range(8, 13)] + [(5, 6)]
    assert triangle_counts(_edges(spark, hub)).collect() == []


def test_single_triangle_with_pendant(spark):
    g = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = {r["node"]: r["n_tri"] for r in triangle_counts(_edges(spark, g)).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_two_triangles_sharing_an_edge(spark):
    # {1,2,3} and {2,3,4} share edge (2,3)
    g = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    got = {r["node"]: r["n_tri"] for r in triangle_counts(_edges(spark, g)).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}
