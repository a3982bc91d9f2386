"""Dedup-operator unit tests: connected components on synthetic graphs."""

from b_pdf_parser_spark.operators.dedup import connected_components


def test_connected_components_shapes(spark):
    # two components {1,2,3,4} (chain) and {10,11}, plus isolated pair {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_cycle_and_bridge(spark):
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (7, 5), (7, 8), (8, 9)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert set(got.values()) == {5} and len(got) == 5
