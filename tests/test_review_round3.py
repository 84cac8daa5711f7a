"""Round-3 review fixes: vincenty cover pad on the bounded kNN path,
Avro named types defined inside null unions, IVF misuse guards and empty
query lists, and streaming-dedup null-content passthrough."""

from __future__ import annotations

import datetime as dt
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.knn import knn_join
from geomesa_spark.sources.layout import as_geotable


def test_knn_vincenty_bounded_cover_includes_edge_neighbor(spark):
    """On the WGS84 equatorial meridian a degree is ~110,574 m, shorter
    than the cover's 111 km sizing — a neighbor at vincenty distance just
    under the bound sits OUTSIDE the unpadded haversine cover box. The
    bounded path must pad the cover like ring expansion does."""
    from geomesa_spark.geom.kernels import vincenty_m

    lat_edge = 0.9030  # vincenty ~99.85 km from (10, 0); > 100000/111000 deg
    d = float(vincenty_m(np.array([10.0]), np.array([0.0]),
                         np.array([10.0]), np.array([lat_edge]))[0])
    assert 99_000 < d < 100_000  # inside the radius bound
    assert lat_edge > 100_000 / 111_000  # outside the unpadded cover

    df = spark.createDataFrame(
        [("near", 10.0, 0.01), ("edge", 10.0, lat_edge), ("far", 10.0, 5.0)],
        "id string, lon double, lat double",
    )
    t = as_geotable(df, dtg=None, fid="id")
    out = knn_join(t, [("q", 10.0, 0.0)], k=5, max_radius_m=100_000,
                   metric="vincenty")
    ids = {r["id"] for r in out.collect()}
    assert ids == {"near", "edge"}


def test_avro_named_type_in_null_union_first_value_null(tmp_path):
    """A record first DEFINED inside a ["null", Sub] union must resolve
    by name later even when the first value takes the null branch."""
    from geomesa_spark.sources.avro_codec import iter_container, write_container

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": ["null", {
                "type": "record", "name": "Sub",
                "fields": [{"name": "x", "type": "long"}],
            }]},
            {"name": "b", "type": "Sub"},
        ],
    }
    records = [
        {"a": None, "b": {"x": 1}},          # first value: null branch
        {"a": {"x": 7}, "b": {"x": 2}},
    ]
    data = write_container(schema, records)
    got = list(iter_container(data))
    assert got == records


def test_ivf_cell_col_requires_centroids(spark):
    from geomesa_spark.operators.ann import ivf_cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    ).withColumn("__cell", F.lit(0))
    with pytest.raises(ValueError, match="centroids"):
        ivf_cosine_topk(emb, [("q", [1.0, 0.0])], k=1, cell_col="__cell")


def test_ann_empty_queries_return_empty(spark):
    from geomesa_spark.operators.ann import cosine_topk, ivf_cosine_topk, lsh_cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    for fn in (cosine_topk, lsh_cosine_topk, ivf_cosine_topk):
        out = fn(emb, [], k=3)
        assert out.count() == 0
        assert set(out.columns) == {"query_id", "vec_id", "sim", "rank"}


def test_hyperplane_n_planes_guard(spark):
    from geomesa_spark.operators.ann import hyperplane_signatures

    emb = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="63"):
        hyperplane_signatures(emb, dim=2, n_planes=64)
    assert "lsh_sig" in hyperplane_signatures(emb, dim=2).columns  # default ok


def test_streaming_dedup_null_text_passthrough(spark, tmp_path):
    from geomesa_spark.streaming.dedup_stream import streaming_exact_dedup

    src = tmp_path / "nulls_src"
    os.makedirs(src)
    rows = [
        {"url": "u1", "text": "same body", "ts": "2024-01-01T00:00:00.000Z"},
        {"url": "u2", "text": "same body", "ts": "2024-01-01T00:00:01.000Z"},
        {"url": "u3", "text": None, "ts": "2024-01-01T00:00:02.000Z"},
        {"url": "u4", "text": None, "ts": "2024-01-01T00:00:03.000Z"},
    ]
    (src / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    stream = spark.readStream.schema("url string, text string, ts timestamp").json(str(src))
    out = streaming_exact_dedup(stream, "text", "ts")
    q = (
        out.writeStream.format("memory").queryName("nulldedup")
        .outputMode("append").trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {r["url"] for r in spark.sql("SELECT url FROM nulldedup").collect()}
    # one survivor for the duplicated body; BOTH distinct null-text rows kept
    assert "u3" in got and "u4" in got
    assert len(got & {"u1", "u2"}) == 1
