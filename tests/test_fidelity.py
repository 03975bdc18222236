"""Reference-fidelity tests: path-regex cases lifted from the reference's
routing layer (publisher.go:133-134), the auth accept/reject matrix
(publisher.go:143-150), and hypothesis property tests for the HLC and
envelope determinism rules (SURVEY.md §5.2)."""

from __future__ import annotations

import os
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_pubsub_spark.sources.cdc import GENERAL_FILE, RESOLVED_FILE, auth_filter

GENERAL = re.compile(GENERAL_FILE)
RESOLVED = re.compile(RESOLVED_FILE)

HLC = "2024010100000000000000000000000001"[:33]


class TestPathRegexFidelity:
    """Cases derived from publisher.go:133 (generalFile) semantics."""

    def test_general_file_groups(self):
        path = f"/v1/my-topic/2020-08-26/{HLC}-e5d21d04-orders-1.ndjson"
        m = GENERAL.search(path)
        assert m
        assert m.group(1) == "my-topic"
        assert m.group(2) == "2020-08-26"
        assert m.group(3) == HLC
        assert m.group(4) == "e5d21d04"
        assert m.group(5) == "orders"
        assert m.group(6) == "1"

    def test_general_rejects_short_hlc(self):
        assert not GENERAL.search("/v1/t/2020-08-26/123-u-orders-1.ndjson")

    def test_general_rejects_bad_date(self):
        assert not GENERAL.search(f"/v1/t/2020-8-26/{HLC}-u-orders-1.ndjson")

    def test_greedy_uniquer_with_dashes(self):
        # (.+) is greedy: a dashed uniquer folds extra segments into group
        # 4, leaving the LAST two dash-separated fields as table/schema —
        # the same backtracking the reference's RE2 pattern performs.
        m = GENERAL.search(f"/v1/t/2020-08-26/{HLC}-a-b-c-orders-1.ndjson")
        assert m and m.group(4) == "a-b-c" and m.group(5) == "orders"

    def test_resolved_intended_pattern_matches(self):
        # The reference's own resolvedFile regex (publisher.go:134) has a
        # typo — `(\d{33)` — and never matches; the engine implements the
        # documented INTENT (SURVEY.md §2.A13). This case would 404 in
        # the reference; it must route as a watermark here.
        m = RESOLVED.search(f"/v1/t/2020-08-26/{HLC}.RESOLVED")
        assert m and m.group(3) == HLC

    def test_reference_typo_reproduced_as_dead(self):
        # Document the divergence: the verbatim broken pattern (with the
        # missing brace) indeed never matches a real resolved path.
        broken = re.compile(r"/([^/]*)/(\d{4}-\d{2}-\d{2})/(\d\{33)\.RESOLVED$")
        assert not broken.search(f"/v1/t/2020-08-26/{HLC}.RESOLVED")

    def test_resolved_checked_before_general(self):
        # Dispatch order (publisher.go:152-165): a RESOLVED path must not
        # accidentally satisfy the general pattern.
        assert not GENERAL.search(f"/v1/t/2020-08-26/{HLC}.RESOLVED")


class TestAuthMatrix:
    """publisher.go:143-150 accept/reject matrix (FIXTURES.md §3)."""

    KEYS = ("xyzzy", "rotated")

    @pytest.fixture()
    def requests(self, spark):
        return spark.createDataFrame(
            [(1, "xyzzy"), (2, "rotated"), (3, "wrong"), (4, None)],
            "req_id int, sharedKey string",
        )

    def test_valid_keys_admitted(self, requests):
        ok, bad = auth_filter(requests, self.KEYS)
        assert {r["req_id"] for r in ok.collect()} == {1, 2}

    def test_invalid_and_missing_rejected(self, requests):
        ok, bad = auth_filter(requests, self.KEYS)
        assert {r["req_id"] for r in bad.collect()} == {3, 4}

    def test_no_keys_admits_all(self, requests):
        ok, bad = auth_filter(requests, ())
        assert ok.count() == 4 and bad.count() == 0

    def test_http_transport_401_rejects(self, spark, sf_dir):
        """TRANSPORT-level auth fidelity (publisher.go:143-150, round-6
        VERDICT item 3): stream_http_ingest's live http.server receiver
        must 401 missing/wrong sharedKey params BEFORE route matching
        and report the observed reject count. The op itself asserts the
        server saw exactly 3 unauthorized requests and raises if any
        reject leaks through; here we pin the surfaced column and that
        the rejected duplicate payloads did not inflate the landed
        counts (total n equals the events table's row count)."""
        from cdc_pubsub_spark.registry import REGISTRY
        from cdc_pubsub_spark.tables import load

        out = REGISTRY["stream_http_ingest"].fn(spark, sf_dir).collect()
        assert out, "http ingest produced no rows"
        assert {r["rejected_unauthorized"] for r in out} == {3}
        landed = sum(r["n"] for r in out)
        assert landed == load(spark, sf_dir, "events").count()


class TestHLCProperties:
    """Property tests for the 33-digit HLC synthesis/decoding contract."""

    @given(
        ms=st.integers(min_value=0, max_value=4_000_000_000_000),
        logical=st.integers(min_value=0, max_value=999_999),
    )
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, ms, logical):
        hlc = str(ms * 1_000_000 + logical).zfill(33)
        assert len(hlc) == 33
        v = int(hlc)
        assert v // 1_000_000 == ms
        assert v % 1_000_000 == logical

    @given(
        a=st.tuples(
            st.integers(min_value=0, max_value=4_000_000_000_000),
            st.integers(min_value=0, max_value=999_999),
        ),
        b=st.tuples(
            st.integers(min_value=0, max_value=4_000_000_000_000),
            st.integers(min_value=0, max_value=999_999),
        ),
    )
    @settings(max_examples=200, deadline=None)
    def test_string_order_is_hlc_order(self, a, b):
        """Zero-padded decimal strings sort exactly like (wall, logical)
        tuples — the property cdc_upsert_materialize's ORDER BY updated
        DESC depends on."""
        ha = str(a[0] * 1_000_000 + a[1]).zfill(33)
        hb = str(b[0] * 1_000_000 + b[1]).zfill(33)
        assert (ha < hb) == (a < b)


@given(
    name=st.text(
        alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
        min_size=2,
        max_size=24,
    ),
    pos=st.integers(min_value=0, max_value=23),
)
@settings(max_examples=200, deadline=None)
def test_symspell_deletion_always_recovers(name, pos):
    """Property behind join_fuzzy_symspell: ANY single-character deletion
    of ANY clean string is contained in that string's deletion-variant
    set, so the SymSpell equi-join can never miss a pure deletion —
    recall 1 by construction, independent of alphabet or position."""
    if pos >= len(name):
        pos = pos % len(name)
    corrupted = name[:pos] + name[pos + 1:]
    variants = {name[:k] + name[k + 1:] for k in range(len(name))}
    assert corrupted in variants


def test_avro_codec_roundtrip_and_corruption():
    """The hand-rolled Avro container codec must round-trip rows exactly
    and reject corrupted blocks/magic loudly."""
    import pytest

    from cdc_pubsub_spark.sources.formats import (
        _avro_decode_supplier,
        _avro_encode_supplier_file,
    )

    rows = [
        (1, "Supplier#1", 3, 123.45),
        (2, "Ünïcode", 0, -7.5),
        (3, "", 24, 0.0),
    ]
    blob = _avro_encode_supplier_file(rows)
    assert _avro_decode_supplier(blob) == rows
    with pytest.raises(ValueError):
        _avro_decode_supplier(b"Not an avro file")
    corrupted = bytearray(blob)
    corrupted[-1] ^= 0xFF  # break the trailing sync marker
    with pytest.raises(ValueError):
        _avro_decode_supplier(bytes(corrupted))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        max_size=30,
    )
)
def test_avro_codec_property_roundtrip(rows):
    """Property: encode∘decode is the identity on arbitrary flat rows —
    zigzag varints (negative longs included), UTF-8 strings of any
    content, and full-range doubles all survive the container format."""
    from cdc_pubsub_spark.sources.formats import (
        _avro_decode_supplier,
        _avro_encode_supplier_file,
    )

    assert _avro_decode_supplier(_avro_encode_supplier_file(rows)) == rows


def test_bare_hostile_session_self_heals():
    """The driver contract promises queries() work on a SparkSession the
    engine did not build (tables.ensure_session_confs self-heals the
    correctness-critical confs on every load). Run conf-sensitive ops in
    a SUBPROCESS whose session is deliberately hostile (America/New_York
    timezone, none of session.py's confs) and hash-compare against
    DuckDB — a regression in the self-heal path (tz, nanosAsLong) shows
    up as MISMATCH here long before the driver sees it."""
    import subprocess
    import sys

    code = """
import sys
from pyspark.sql import SparkSession
import duckdb
import cdc_pubsub_spark.all_queries
from cdc_pubsub_spark.registry import REGISTRY
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "America/New_York")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in ["events", "orders"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
for op in ["events_heatmap_dow_hour", "orders_survival_curve"]:
    sdf = REGISTRY[op].fn(spark, sf).toPandas()
    ddf = con.sql(REGISTRY[op].oracle).df()
    cols = sorted(sdf.columns)
    s = sorted(map(str, sdf[cols].round(4).itertuples(index=False, name=None)))
    d = sorted(map(str, ddf[sorted(ddf.columns)].round(4).itertuples(index=False, name=None)))
    if s != d:
        print(f"MISMATCH {op}"); sys.exit(1)
print("BARE-SESSION-OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "BARE-SESSION-OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])


def test_protobuf_codec_roundtrip_corruption_and_unknown_fields():
    """The from-spec protobuf wire codec must round-trip rows exactly,
    reject truncated/overrunning messages loudly, and SKIP unknown
    fields by wire type (the forward-compatibility contract the wire
    format exists for)."""
    import struct

    import pytest

    from cdc_pubsub_spark.sources.formats import (
        _pb_decode_supplier_stream,
        _pb_encode_supplier_stream,
        _pb_varint,
    )

    rows = [
        (1, "Supplier#1", 3, 123.45),
        (2, "Ünïcode", 0, -7.5),
        (3, "", 24, 0.0),
    ]
    blob = _pb_encode_supplier_stream(rows)
    assert _pb_decode_supplier_stream(blob) == rows
    # Truncation mid-message.
    with pytest.raises(ValueError):
        _pb_decode_supplier_stream(blob[:-3])
    # Unknown field (tag 9, varint) injected into a message must be
    # skipped, not break the parse.
    msg = bytearray()
    msg += b"\x08" + _pb_varint(7)
    msg += bytes([9 << 3 | 0]) + _pb_varint(999)  # unknown field 9
    msg += b"\x12" + _pb_varint(2) + b"ok"
    msg += b"\x18" + _pb_varint(4)
    msg += b"\x21" + struct.pack("<d", 1.5)
    framed = _pb_varint(len(msg)) + bytes(msg)
    assert _pb_decode_supplier_stream(framed) == [(7, "ok", 4, 1.5)]
    # Regression (code-review finding): a crafted wire-type-2 length
    # varint decoding NEGATIVE used to march the cursor backward onto
    # the same tag and loop forever. Must raise, not hang.
    evil = bytearray()
    evil += b"\x12" + _pb_varint(2**64 - 11)  # name field, length "-11"
    framed_evil = _pb_varint(len(evil)) + bytes(evil)
    with pytest.raises(ValueError):
        _pb_decode_supplier_stream(framed_evil)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
        max_size=12,
    )
)
def test_protobuf_codec_property_roundtrip(rows):
    """Arbitrary rows (negative ints exercise the 10-byte two's-
    complement varints, arbitrary text the UTF-8 length framing) must
    survive encode→decode bit-exactly."""
    from cdc_pubsub_spark.sources.formats import (
        _pb_decode_supplier_stream,
        _pb_encode_supplier_stream,
    )

    assert _pb_decode_supplier_stream(_pb_encode_supplier_stream(rows)) == rows


def test_ack_on_failure_loss_delta_vs_exactly_once(spark, sf_dir):
    """The A9 fidelity pair (publisher.go:204-211): compat_ack_on_failure
    models the dead `if err != nil` future-check — every batch ACKs 201
    even when futures failed, so the failed slice is lost forever —
    while sink_exactly_once_manifest's commit protocol delivers every
    message from the same fixture exactly once. Pin (a) the bug actually
    loses data, (b) every batch acked despite failures to nack, and
    (c) bug losses + bug deliveries == the fixed sink's per-type counts.
    """
    import cdc_pubsub_spark.all_queries  # noqa: F401
    from cdc_pubsub_spark.registry import REGISTRY

    bug = {
        r["event_type"]: r
        for r in REGISTRY["compat_ack_on_failure"].fn(spark, sf_dir).collect()
    }
    fixed = {
        r["event_type"]: r
        for r in REGISTRY["sink_exactly_once_manifest"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(bug) == set(fixed)
    assert sum(r["n_lost"] for r in bug.values()) > 0, (
        "fixture must exercise the failing-future slice"
    )
    for et, r in bug.items():
        # The bug: every batch a type appeared in was ACKed, including
        # every batch that had a failed future and should have 500'd.
        assert r["should_have_nacked"] <= r["acked_batches"]
        assert r["n_delivered"] + r["n_lost"] == r["n_sent"]
        # The fixed sink delivers ALL sent messages for the same fixture.
        assert fixed[et]["n"] == r["n_sent"]
        if r["n_lost"] > 0:
            assert fixed[et]["n"] > r["n_delivered"], (
                f"{et}: exactly-once must out-deliver the buggy ACK path"
            )
