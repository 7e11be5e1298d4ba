"""S3 conditional-PUT implementation of the lake's CommitProtocol.

The lake's whole transactionality rests on one primitive — *publish
these bytes under this name, or fail if the name exists*
(lake/table.py CommitProtocol). On S3 that primitive is the
conditional PUT: ``PutObject`` with ``IfNoneMatch: "*"`` fails with
HTTP 412 (PreconditionFailed) when the key already exists — atomic on
the S3 side since the 2024 conditional-writes GA, with strongly
consistent GET/LIST since 2020. This module maps the contract onto
those calls.

The client is INJECTED (any object with the boto3 S3-client method
surface: put_object / get_object / list_objects_v2 / head_object /
delete_object). In a deployment that is ``boto3.client("s3")``; boto3
is not in this sandbox image, so the class is exercised against an
in-process fake with faithful conditional-PUT and paginated-LIST
semantics (tests/test_concurrency.py) — the same seam-test strategy as
InMemoryCommitProtocol, but through the REAL request/response shapes a
boto3 client produces (412 ClientError, ListObjectsV2 pagination,
missing-key 404s).

Reference analog: the reference's committer also routes through a
service that arbitrates the latest-version pointer (Iceberg catalog,
radiant/tasks/iceberg/utils.py:61-96).
"""

from __future__ import annotations

import datetime as _dt

from radiant_portal_pipeline_spark.lake.table import CommitProtocol


def _error_code(exc: Exception) -> str:
    """Code from a botocore-style ClientError (or fake): shaped as
    ``exc.response["Error"]["Code"]``; '' when not that shape."""
    resp = getattr(exc, "response", None)
    if isinstance(resp, dict):
        return str(resp.get("Error", {}).get("Code", ""))
    return ""


class S3ConditionalPutProtocol(CommitProtocol):
    """``bucket`` + injected ``client``; target paths are mapped to
    keys by stripping a leading ``s3://<bucket>/`` or ``/``. All five
    contract methods raise the contract's exception types
    (FileExistsError on the commit race, FileNotFoundError on missing
    names), never botocore types."""

    def __init__(self, bucket: str, client):
        if client is None:
            raise ValueError(
                "S3ConditionalPutProtocol needs a client (boto3.client('s3') "
                "in a deployment; tests inject a fake)"
            )
        self.bucket = bucket
        self.client = client

    def _key(self, target: str) -> str:
        prefix = f"s3://{self.bucket}/"
        if target.startswith(prefix):
            return target[len(prefix):]
        return target.lstrip("/")

    def publish(self, target: str, data: bytes) -> None:
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._key(target),
                Body=bytes(data),
                IfNoneMatch="*",
            )
        except Exception as e:  # noqa: BLE001 — translate, never leak
            if _error_code(e) in ("PreconditionFailed", "412"):
                raise FileExistsError(target) from e
            raise

    def read(self, target: str) -> str:
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._key(target)
            )
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in ("NoSuchKey", "404"):
                raise FileNotFoundError(target) from e
            raise
        body = resp["Body"]
        data = body.read() if hasattr(body, "read") else body
        return data.decode() if isinstance(data, bytes) else str(data)

    def list_names(self, directory: str) -> list[str]:
        prefix = self._key(directory).rstrip("/") + "/"
        names: list[str] = []
        token = None
        while True:  # real LIST paginates at 1000 keys
            kwargs = {
                "Bucket": self.bucket,
                "Prefix": prefix,
                "Delimiter": "/",
            }
            if token:
                kwargs["ContinuationToken"] = token
            resp = self.client.list_objects_v2(**kwargs)
            for obj in resp.get("Contents", []):
                names.append(obj["Key"][len(prefix):])
            if not resp.get("IsTruncated"):
                return names
            token = resp.get("NextContinuationToken")

    def delete(self, target: str) -> None:
        key = self._key(target)
        # S3 DELETE is idempotent; the contract distinguishes
        # missing names, so probe first (GC paths only — never raced)
        try:
            self.client.head_object(Bucket=self.bucket, Key=key)
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in ("NoSuchKey", "404"):
                raise FileNotFoundError(target) from e
            raise
        self.client.delete_object(Bucket=self.bucket, Key=key)

    def age_seconds(self, target: str) -> float | None:
        try:
            resp = self.client.head_object(
                Bucket=self.bucket, Key=self._key(target)
            )
        except Exception:  # noqa: BLE001 — unknown age = never GC'd
            return None
        lm = resp.get("LastModified")
        if lm is None:
            return None
        now = _dt.datetime.now(_dt.timezone.utc)
        if lm.tzinfo is None:
            lm = lm.replace(tzinfo=_dt.timezone.utc)
        return (now - lm).total_seconds()
