"""K6 cloud-storage smoke: exercise the S3A path against a moto mock
S3 endpoint when (and only when) the hadoop-aws jars are present.

This container's pyspark distribution ships WITHOUT hadoop-aws /
aws-sdk-bundle (cluster distros add them), so here the test SKIPS with
an explicit reason — on a real cluster image it runs end-to-end:
moto server → bucket → ``df.write.parquet("s3a://…")`` → read-back.
The file:// second-root twin (tests/test_sequencer.py::
test_second_storage_root_file_uri) covers the engine's own sink code
on every environment; this test covers the S3A wiring itself
(``session.S3A_CONF`` + endpoint/credential conf).
"""

from __future__ import annotations

import glob
import os
import socket

import pytest

pyspark_jars = glob.glob(
    os.path.join(
        os.path.dirname(__import__("pyspark").__file__), "jars", "hadoop-aws*.jar"
    )
)

pytestmark = pytest.mark.skipif(
    not pyspark_jars,
    reason="hadoop-aws jars not in this pyspark distribution (cluster "
    "distros ship them); S3A wiring covered there, file:// twin covers "
    "the sink layer here",
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def moto_s3_endpoint():
    from moto.server import ThreadedMotoServer

    port = _free_port()
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port)
    server.start()
    try:
        yield f"http://127.0.0.1:{port}"
    finally:
        server.stop()


def test_s3a_write_read_roundtrip(moto_s3_endpoint, tmp_path):
    import boto3

    from small_etl_spark.session import S3A_CONF, get_spark

    boto3.client(
        "s3",
        endpoint_url=moto_s3_endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    ).create_bucket(Bucket="graft-test")

    conf = dict(S3A_CONF)
    conf.update(
        {
            "spark.hadoop.fs.s3a.endpoint": moto_s3_endpoint,
            "spark.hadoop.fs.s3a.path.style.access": "true",
            "spark.hadoop.fs.s3a.access.key": "testing",
            "spark.hadoop.fs.s3a.secret.key": "testing",
            "spark.hadoop.fs.s3a.connection.ssl.enabled": "false",
            "spark.hadoop.fs.s3a.aws.credentials.provider": (
                "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
            ),
        }
    )
    spark = get_spark("s3a-smoke", extra_conf=conf)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df.write.mode("overwrite").parquet("s3a://graft-test/out")
    back = spark.read.parquet("s3a://graft-test/out")
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]
