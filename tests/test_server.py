"""HTTP search surface: real socket round-trips against a live store.

Covers the reference's two client content types (ref: bin/search.py:42-49
S3-XML GET; MetadataQueryExecutor.scala:52-59 JSON-array contract) plus
keyset continuation, error shaping, and the empty-bucket semantics."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

import pytest

from clueso_spark.operators import MetadataQueryExecutor
from clueso_spark.server import SearchServer, s3_xml_listing
from clueso_spark.streaming.ingest import parse_events
from tests.conftest import put_doc, raw_df, wire_event

S3_NS = "{http://s3.amazonaws.com/doc/2006-03-01/}"
BUCKET = "restbucket"


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    from clueso_spark.sources import MetadataStore

    store = MetadataStore(
        spark, str(tmp_path_factory.mktemp("rest") / "mdstore")
    )
    lines = [
        wire_event(
            f"{i:06d}",
            "put",
            BUCKET,
            f"obj-{i:03d}",
            put_doc(
                f"obj-{i:03d}",
                BUCKET,
                user_md={"color": "red" if i % 2 == 0 else "blue"},
            ),
        )
        for i in range(10)
    ]
    store.write_landing(
        parse_events(raw_df(spark, lines), compaction_record_interval=100)
    )
    with SearchServer(MetadataQueryExecutor(spark, store)) as srv:
        yield srv


def _get(url: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(url, timeout=120) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _query(srv, bucket: str, **params) -> tuple[int, str]:
    qs = urllib.parse.urlencode(params)
    return _get(f"{srv.url}/{bucket}?{qs}")


def test_xml_listing_round_trip(served):
    """The perf-tool contract: parse ListBucketResult, iterate Contents,
    find the key (ref: bin/perf_test.py:123-127)."""
    status, body = _query(
        served, BUCKET, search="userMd.`x-amz-meta-color` = 'red'"
    )
    assert status == 200
    root = ET.fromstring(body)
    assert root.tag == f"{S3_NS}ListBucketResult"
    keys = [c.find(f"{S3_NS}Key").text for c in root.iter(f"{S3_NS}Contents")]
    assert keys == [f"obj-{i:03d}" for i in range(0, 10, 2)]
    first = next(root.iter(f"{S3_NS}Contents"))
    assert first.find(f"{S3_NS}Size").text == "100"
    assert first.find(f"{S3_NS}StorageClass").text == "STANDARD"
    assert first.find(f"{S3_NS}Owner/{S3_NS}ID").text == "owner1"
    assert '"' in first.find(f"{S3_NS}ETag").text  # quoted, S3-style
    assert root.find(f"{S3_NS}IsTruncated").text == "false"
    assert root.find(f"{S3_NS}KeyCount").text == "5"


def test_keyset_continuation_via_next_start_after(served):
    """Page through with limit=4: NextStartAfter carries the keyset
    cursor; following it enumerates every key exactly once."""
    seen, start = [], None
    for _ in range(10):  # bounded walk
        params = {"limit": 4}
        if start:
            params["start-after"] = start
        status, body = _query(served, BUCKET, **params)
        assert status == 200
        root = ET.fromstring(body)
        page = [
            c.find(f"{S3_NS}Key").text for c in root.iter(f"{S3_NS}Contents")
        ]
        seen.extend(page)
        nxt = root.find(f"{S3_NS}NextStartAfter")
        if root.find(f"{S3_NS}IsTruncated").text == "false" or nxt is None:
            break
        start = nxt.text
    assert seen == [f"obj-{i:03d}" for i in range(10)]


def test_json_format_is_the_livy_contract(served):
    status, body = _query(
        served,
        BUCKET,
        search="userMd.`x-amz-meta-color` = 'blue'",
        format="json",
    )
    assert status == 200
    rows = json.loads(body)
    assert [r["key"] for r in rows] == [f"obj-{i:03d}" for i in range(1, 10, 2)]
    # the 8 fixed result columns (ref: CluesoConstants.scala:71-79)
    assert set(rows[0]) == {
        "key", "last-modified", "content-md5", "owner-id",
        "owner-display-name", "content-length", "x-amz-storage-class",
        "bucket",
    }


def test_malformed_search_is_s3_invalid_argument(served):
    status, body = _query(served, BUCKET, search="NOT A ((VALID")
    assert status == 400
    root = ET.fromstring(body)
    assert root.find("Code").text == "InvalidArgument"


def test_unknown_bucket_is_empty_listing(served):
    status, body = _query(served, "nosuchbucket")
    assert status == 200
    root = ET.fromstring(body)
    assert root.find(f"{S3_NS}KeyCount").text == "0"
    assert not list(root.iter(f"{S3_NS}Contents"))


def test_bad_paths_and_params_are_400(served):
    status, _ = _get(f"{served.url}/")
    assert status == 400
    status, _ = _get(f"{served.url}/a/b")
    assert status == 400
    status, _ = _query(served, BUCKET, limit="tenish")
    assert status == 400


def test_xml_escaping_of_hostile_values():
    """Pure renderer: keys and metadata containing XML metacharacters
    must escape, and the document must stay parseable."""
    body = s3_xml_listing(
        "b<am>p",
        [
            {
                "key": 'k<&>"',
                "last-modified": "2026-01-01T00:00:00.000Z",
                "content-md5": "x",
                "owner-id": "o&o",
                "owner-display-name": "<Owner/>",
                "content-length": 1,
                "x-amz-storage-class": "STANDARD",
                "bucket": "b",
            }
        ],
        prefix_expr="a < b",
        max_keys=5,
        truncated=False,
    )
    root = ET.fromstring(body)
    c = next(root.iter(f"{S3_NS}Contents"))
    assert c.find(f"{S3_NS}Key").text == 'k<&>"'
    assert c.find(f"{S3_NS}Owner/{S3_NS}DisplayName").text == "<Owner/>"


def test_serve_cli_round_trip(spark, tmp_path, monkeypatch):
    """The serve CLI wires config -> engine -> live HTTP endpoint; drive
    one real request against it (SIGTERM path exercised by stopping the
    server through the context manager the CLI uses)."""
    from clueso_spark.config import CluesoSparkConfig, build_engine
    from clueso_spark.server import SearchServer
    from clueso_spark.streaming.ingest import parse_events
    from tests.conftest import op, put_doc, raw_df, wire_event

    cfg = CluesoSparkConfig(
        store_root=str(tmp_path / "store"), cache_dataframes=False
    )
    store, executor, _ = build_engine(spark, cfg)
    store.write_landing(
        parse_events(
            raw_df(
                spark,
                [wire_event(op(1), "put", "sb", "k1", put_doc("k1", "sb"))],
            ),
            compaction_record_interval=10,
        )
    )
    with SearchServer(executor) as srv:
        status, body = _get(f"{srv.url}/sb?format=json")
        assert status == 200
        assert json.loads(body)[0]["key"] == "k1"


def test_runtime_engine_error_is_s3_internal_error(served):
    """ANSI mode makes cast/arithmetic errors RUNTIME failures (they
    parse + analyze clean); the endpoint must still answer with an
    S3-shaped document, never abort the socket."""
    status, body = _query(served, BUCKET, search="cast(key as int) = 1")
    assert status == 500
    root = ET.fromstring(body)
    assert root.find("Code").text == "InternalError"


def test_limit_is_clamped_like_s3_maxkeys(served):
    from clueso_spark.server.rest import MAX_PAGE_KEYS

    status, body = _query(served, BUCKET, limit=str(MAX_PAGE_KEYS * 1000))
    assert status == 200
    root = ET.fromstring(body)
    assert int(root.find(f"{S3_NS}MaxKeys").text) == MAX_PAGE_KEYS


@pytest.mark.parametrize(
    "expr",
    [
        "reflect('java.lang.System','getProperty','user.dir') = 'x'",
        "JAVA_METHOD('java.lang.Runtime','getRuntime') is not null",
        "`reflect`('a','b') = 'c'",          # backtick-quoted identifier
        "key = 'a' or Reflect ('x','y')='z'",  # spacing + mixed case
        # the try-variant: `_` is a word char, so a reflect-only \b
        # pattern does NOT match inside try_reflect -- it needs its own
        # denylist entry (round-11 registry audit finding)
        "try_reflect('java.lang.System','getProperty','user.dir') = 'x'",
        "`TRY_REFLECT`('a','b') = 'c'",
    ],
)
def test_jvm_escape_predicates_are_denied(served, expr):
    """ADVICE r9 (medium): reflect/java_method invoke arbitrary JVM
    static methods on the driver; the unauthenticated surface must
    reject them BEFORE any plan is built, in both formats."""
    for fmt in ("xml", "json"):
        status, body = _query(served, BUCKET, search=expr, format=fmt)
        assert status == 403, (fmt, expr, body)
        root = ET.fromstring(body)
        assert root.find("Code").text == "AccessDenied"


def test_exact_multiple_page_is_not_truncated(served):
    """ADVICE r9 (low): a result set whose size is an exact multiple of
    limit must report IsTruncated=false on its final (exactly full)
    page, not advertise a cursor to an empty page. 10 objects, limit=5:
    page 2 is full AND final."""
    status, body = _query(served, BUCKET, limit=5)
    root = ET.fromstring(body)
    assert root.find(f"{S3_NS}IsTruncated").text == "true"
    cursor = root.find(f"{S3_NS}NextStartAfter").text
    status, body = _query(served, BUCKET, limit=5, **{"start-after": cursor})
    assert status == 200
    root = ET.fromstring(body)
    assert root.find(f"{S3_NS}KeyCount").text == "5"
    assert root.find(f"{S3_NS}IsTruncated").text == "false"
    assert root.find(f"{S3_NS}NextStartAfter") is None


def test_xml_path_records_search_metrics(spark, tmp_path):
    """The default XML format must feed the same per-bucket counters the
    JSON path gets -- a graphite dashboard watching an XML-only client
    must see traffic."""
    from clueso_spark.metrics import SearchMetrics
    from clueso_spark.sources import MetadataStore

    store = MetadataStore(spark, str(tmp_path / "m"))
    store.write_landing(
        parse_events(
            raw_df(
                spark,
                [wire_event("000001", "put", "mx", "k", put_doc("k", "mx"))],
            ),
            compaction_record_interval=10,
        )
    )
    ex = MetadataQueryExecutor(spark, store, metrics=SearchMetrics())
    with SearchServer(ex) as srv:
        _get(f"{srv.url}/mx")
    snap = ex.metrics.snapshot()
    assert snap.get("search_count.mx", 0) == 1
    assert "search_time.mx.milli.last" in snap


def test_denylist_covers_every_registered_reflection_function(spark):
    """Mechanical version pin for the JVM-escape deny-list (ADVICE
    r10): enumerate the LIVE session's function registry and assert
    every function implemented by a reflection expression class is
    denied. A Spark upgrade that registers a new driver-escape name
    (as 3.5 did with try_reflect / TryReflect) fails here loudly
    instead of silently reopening the unauthenticated surface."""
    from clueso_spark.server.rest import DENIED_PREDICATE_FUNCTIONS

    reflection_backed = {
        f.name.lower()
        for f in spark.catalog.listFunctions()
        if f.className and "reflect" in f.className.lower()
    }
    # sanity: the known escape hatches must actually be in the registry
    # (an empty set would mean the enumeration broke, not that Spark
    # dropped reflection)
    assert {"reflect", "java_method", "try_reflect"} <= reflection_backed
    uncovered = reflection_backed - set(DENIED_PREDICATE_FUNCTIONS)
    assert not uncovered, (
        f"reflection-backed SQL functions not in the deny-list: "
        f"{sorted(uncovered)}"
    )
