"""Kafka JSON wire contract (S1/S2/S3) — pinned without a broker.

The broker itself can't run in this container, so these tests pin both
sides of the wire format instead: the ingest contract (the reference's
IPFIXCol JSON with dotted ``ipfix.*`` keys, kafkaIO.py:57-61) and the
result contract (``@type``-tagged JSON lines, e.g.
protocols_statistics.py:52-59 / 67-79). If these pass, plugging in a real
broker only changes the transport.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from stream4flow_spark.streaming.kafka import parse_flow_json


def test_ingest_contract_dotted_keys_and_null_tolerance(spark):
    """S2: reference-style dotted keys parse into typed ipfix_* columns;
    absent keys become NULL (replacing per-app key-presence guards);
    the underscore spelling is accepted too; junk never throws."""
    msgs = [
        json.dumps(
            {
                "ipfix.sourceIPv4Address": "10.0.0.1",
                "ipfix.destinationIPv4Address": "10.0.0.2",
                "ipfix.protocolIdentifier": 6,
                "ipfix.packetDeltaCount": 42,
                "ipfix.octetDeltaCount": 4200,
                "ipfix.flowStartMilliseconds": 1_600_000_000_000,
            }
        ),
        json.dumps(  # underscore spelling, partial record
            {"ipfix_protocolIdentifier": 17, "ipfix_packetDeltaCount": 7}
        ),
        "not json at all",
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    flows = df.select(parse_flow_json(F.col("value")).alias("f")).select("f.*")
    rows = flows.collect()

    assert rows[0].ipfix_sourceIPv4Address == "10.0.0.1"
    assert rows[0].ipfix_protocolIdentifier == 6
    assert rows[0].ipfix_packetDeltaCount == 42
    assert rows[0].ipfix_flowStartMilliseconds == 1_600_000_000_000
    assert rows[0].ipfix_tcpControlBits is None  # absent -> NULL

    assert rows[1].ipfix_protocolIdentifier == 17
    assert rows[1].ipfix_sourceIPv4Address is None

    assert all(v is None for v in rows[2].asDict().values())  # junk -> NULLs


def test_result_contract_round_trip_protocols_statistics(spark):
    """S3/O1: the result JSON carries the reference's keys (@type tag +
    measures, protocols_statistics.py:67-73) and round-trips through
    from_json losslessly — consumers on the results topic can rebuild the
    typed rows."""
    from stream4flow_spark.apps.protocols_statistics import (
        protocols_statistics,
        to_output_json,
    )
    from stream4flow_spark.fixtures.flows import flows_df
    from tests.conftest import SF_DIR

    stats = protocols_statistics(flows_df(spark, SF_DIR), "1 hour")
    wire = to_output_json(stats)

    # every message is one JSON object with exactly the reference's keys
    first = json.loads(wire.first().value)
    assert first["@type"] == "protocols_statistics"
    assert set(first) == {
        "@type", "protocol", "flows", "packets", "bytes", "window_start_ms",
    }

    out_schema = (
        "`@type` string, protocol string, flows bigint, packets bigint, "
        "bytes bigint, window_start_ms bigint"
    )
    back = (
        wire.select(F.from_json("value", out_schema).alias("r"))
        .select("r.protocol", "r.flows", "r.packets", "r.bytes", "r.window_start_ms")
    )
    a = stats.select(*back.columns).toPandas().sort_values(
        ["window_start_ms", "protocol"], ignore_index=True
    )
    b = back.toPandas().sort_values(
        ["window_start_ms", "protocol"], ignore_index=True
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_quarantine_lane_separates_corrupt_records(spark):
    """Malformed JSON lands in _corrupt_record with the raw line intact;
    clean rows parse typed with a NULL quarantine column."""
    from pyspark.sql import functions as F

    from stream4flow_spark.streaming.kafka import (
        parse_flow_json_with_quarantine,
    )

    df = spark.createDataFrame(
        [
            ('{"ipfix.sourceIPv4Address": "10.0.0.1", "ipfix.packetDeltaCount": 3}',),
            ('{"ipfix.sourceIPv4Address": "10.0.0.2", OOPS',),
            ("not json at all",),
        ],
        "value string",
    )
    out = parse_flow_json_with_quarantine(df).collect()
    clean = [r for r in out if r["_corrupt_record"] is None]
    bad = [r for r in out if r["_corrupt_record"] is not None]
    assert len(clean) == 1 and clean[0].ipfix_sourceIPv4Address == "10.0.0.1"
    assert len(bad) == 2
    assert any("OOPS" in r["_corrupt_record"] for r in bad)
