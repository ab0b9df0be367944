"""HTTP search surface: the reference's client protocol re-hosted.

The reference exposes search two ways: a Livy-submitted job whose
stdout is a JSON array (ref: MetadataQueryExecutor.scala:52-59), and an
S3-endpoint GET ``/<bucket>?search=<expr>`` whose response embeds an S3
ListBucketResult XML document the perf/client tooling parses (ref:
bin/search.py:42-49, bin/perf_test.py:123-127). This package serves
both content types from one stdlib HTTP server wrapped around a
MetadataQueryExecutor.
"""

from clueso_spark.server.rest import SearchServer, s3_xml_listing

__all__ = ["SearchServer", "s3_xml_listing"]
