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
        payload = bytes(data)
        try:
            self.client.put_object(
                Bucket=self.bucket,
                Key=self._key(target),
                Body=payload,
                IfNoneMatch="*",
            )
        except Exception as e:  # noqa: BLE001 — translate, never leak
            if _error_code(e) not in ("PreconditionFailed", "412"):
                raise
            # A 412 is AMBIGUOUS under SDK retries: boto3's default
            # retry of a timed-out-but-landed conditional PUT gets 412
            # for the writer's OWN committed object. Translating that
            # to FileExistsError would make the commit loop rebase on a
            # snapshot that already contains its own commit and
            # re-apply the mutation (duplicate data files on non-epoch
            # commits). Disambiguate by content: byte-identical object
            # == our PUT landed (or an identical commit won, which is
            # equally a success); anything else is a genuine race. The
            # GET is retried on TRANSPORT errors — misreading a
            # transient throttle as "lost the race" would reintroduce
            # the double-apply this branch exists to prevent; when
            # still undecidable the transport error surfaces instead
            # of guessing either way.
            last_transport: Exception | None = None
            for _ in range(3):
                try:
                    existing = self.client.get_object(
                        Bucket=self.bucket, Key=self._key(target)
                    )
                    # the streaming body read can ALSO fail mid-
                    # transfer — treat it as the same retryable
                    # transport failure as the GET itself
                    body = existing["Body"]
                    got = body.read() if hasattr(body, "read") else body
                except Exception as ge:  # noqa: BLE001
                    if _error_code(ge) in ("NoSuchKey", "404"):
                        # existed at PUT time, gone now: another
                        # writer's object came and went — a real race
                        raise FileExistsError(target) from e
                    last_transport = ge
                    continue
                if isinstance(got, str):
                    got = got.encode()
                if got == payload:
                    return  # own (retried) PUT landed — commit succeeded
                raise FileExistsError(target) from e
            raise last_transport  # undecidable — surface, don't guess

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
        # S3 DELETE is idempotent; the contract distinguishes missing
        # names, so probe first. The HEAD also yields the ETag for a
        # CONDITIONAL delete (If-Match, GA since Nov 2024), which
        # closes the head-then-delete TOCTOU: if another actor removed
        # or replaced the object between the two calls, the delete
        # fails 412/404 instead of silently deleting the replacement.
        try:
            resp = self.client.head_object(Bucket=self.bucket, Key=key)
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in ("NoSuchKey", "404"):
                raise FileNotFoundError(target) from e
            raise
        etag = (resp or {}).get("ETag")
        try:
            if etag:
                self.client.delete_object(
                    Bucket=self.bucket, Key=key, IfMatch=etag
                )
            else:
                self.client.delete_object(Bucket=self.bucket, Key=key)
        except TypeError:
            # injected fake predates conditional deletes — fall back
            # to the unconditional (documented GC-only) path
            self.client.delete_object(Bucket=self.bucket, Key=key)
        except Exception as e:  # noqa: BLE001
            if _error_code(e) in ("PreconditionFailed", "412", "NoSuchKey", "404"):
                # raced: the object we probed is gone/replaced — the
                # name no longer holds what the caller asked to delete
                raise FileNotFoundError(target) from e
            if type(e).__name__ == "ParamValidationError":
                # a real botocore older than S3 conditional deletes
                # (GA Nov 2024) rejects the IfMatch kwarg client-side
                # with ParamValidationError, not TypeError — same
                # fallback (round-5 review finding #3)
                self.client.delete_object(Bucket=self.bucket, Key=key)
                return
            raise

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
