"""Thin GCP REST clients: Dataproc job submit/poll and GCS object ops.

Completes the submission story behind the seams ``submit.py`` already
ships: ``build_dataproc_job`` constructs the request body and
``poll_job``/``get_with_retry`` are the offline-tested state machine;
this module supplies the actual HTTP execution the reference performs
with its Google API client (/root/reference/dataproc/job.go:62-116,
/root/reference/internal/storage/storage.go:21-133) — but as ~100 lines
of stdlib urllib against the public REST endpoints, with the transport
and token provider injected so every code path here runs under tests
with a stubbed transport (no network, no credentials in the sandbox).

Auth follows the reference's convention (gcloud.go:19-29): a bearer
token from the ambient gcloud identity — ``token_provider`` defaults to
``gcloud auth print-access-token``.
"""

from __future__ import annotations

import json
import subprocess
import urllib.error
import urllib.parse
import urllib.request
from typing import Callable, Iterator

from gomrjob_spark.submit import (
    DataprocUnavailableError,
    SubmitConfig,
    build_dataproc_job,
    poll_job,
)

#: transport signature: (method, url, body bytes | None, headers) ->
#: (status_code, response bytes). Injected everywhere; the default is
#: stdlib urllib.
Transport = Callable[[str, str, bytes | None, dict], tuple[int, bytes]]


def urllib_transport(method: str, url: str, body: bytes | None, headers: dict) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=body, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()


def gcloud_token() -> str:
    """Ambient gcloud identity (reference gcloud.go:19-29 ran the gcloud
    CLI the same way for its service-account flow)."""
    return subprocess.run(
        ["gcloud", "auth", "print-access-token"],
        check=True,
        capture_output=True,
        text=True,
    ).stdout.strip()


class _RestClient:
    def __init__(
        self,
        transport: Transport | None = None,
        token_provider: Callable[[], str] | None = None,
    ):
        self._transport = transport or urllib_transport
        self._token = token_provider or gcloud_token

    def _request(self, method: str, url: str, body: dict | None = None) -> dict:
        """One authenticated JSON request. 503 raises
        DataprocUnavailableError (the retryable class get_with_retry and
        poll_job already handle); other non-2xx raise RuntimeError with
        the error body."""
        headers = {
            "Authorization": f"Bearer {self._token()}",
            "Content-Type": "application/json",
        }
        data = json.dumps(body).encode() if body is not None else None
        status, raw = self._transport(method, url, data, headers)
        if status == 503:
            raise DataprocUnavailableError(f"{method} {url} -> 503")
        if not 200 <= status < 300:
            raise RuntimeError(f"{method} {url} -> {status}: {raw[:500]!r}")
        return json.loads(raw) if raw else {}


class DataprocClient(_RestClient):
    """jobs:submit + jobs.get + wait loop over the public Dataproc v1
    REST API — the executable counterpart of the reference's submit/poll
    (dataproc/job.go:62-116). The poll loop IS submit.poll_job: this
    class only supplies its ``fetch_state``."""

    def __init__(
        self,
        project: str,
        region: str,
        transport: Transport | None = None,
        token_provider: Callable[[], str] | None = None,
        api_base: str = "https://dataproc.googleapis.com/v1",
    ):
        super().__init__(transport, token_provider)
        self.project = project
        self.region = region
        # api_base is injectable so the REAL urllib transport can be
        # exercised against a loopback http.server in tests (the sandbox
        # has no external network); production leaves the default
        self._base = (
            f"{api_base}/projects/"
            f"{urllib.parse.quote(project)}/regions/{urllib.parse.quote(region)}"
        )

    def submit(self, cfg: SubmitConfig, cluster: str, bucket: str | None = None) -> str:
        """POST the built job body; returns the server-assigned job id."""
        body = build_dataproc_job(cfg, self.project, self.region, cluster, bucket)
        resp = self._request("POST", f"{self._base}/jobs:submit", body)
        return resp["reference"]["jobId"]

    def job_state(self, job_id: str) -> str:
        resp = self._request("GET", f"{self._base}/jobs/{urllib.parse.quote(job_id)}")
        return resp["status"]["state"]

    def wait(
        self,
        job_id: str,
        sleep=None,
        log=None,
        poll_interval: float = 2.0,
        max_polls: int | None = None,
    ) -> str:
        """Block until terminal; DONE returns, error states raise
        DataprocJobError, 503s retried x5 — submit.poll_job semantics
        verbatim (it is the same function)."""
        return poll_job(
            lambda: self.job_state(job_id),
            job_id,
            sleep=sleep,
            log=log,
            poll_interval=poll_interval,
            max_polls=max_polls,
        )


class GcsClient(_RestClient):
    """Flat-namespace GCS object ops over the public JSON API — the
    reference's storage surface (storage.go:21-133), including the
    nextPageToken List loop (storage.go:71-99) that FsOps.delete_prefix
    mirrors semantically through the Hadoop connector."""

    _BASE = "https://storage.googleapis.com/storage/v1"
    _UPLOAD_BASE = "https://storage.googleapis.com/upload/storage/v1"

    def __init__(
        self,
        transport: Transport | None = None,
        token_provider: Callable[[], str] | None = None,
        api_base: str | None = None,
        upload_base: str | None = None,
    ):
        super().__init__(transport, token_provider)
        # injectable for loopback-socket tests (see DataprocClient)
        if api_base is not None:
            self._BASE = api_base
        if upload_base is not None:
            self._UPLOAD_BASE = upload_base

    def list_objects(self, bucket: str, prefix: str) -> Iterator[dict]:
        """Yield object resources under ``prefix``, following
        nextPageToken until exhausted — one GET per page, constant
        memory regardless of object count."""
        token: str | None = None
        while True:
            params = {"prefix": prefix}
            if token:
                params["pageToken"] = token
            url = (
                f"{self._BASE}/b/{urllib.parse.quote(bucket)}/o?"
                + urllib.parse.urlencode(params)
            )
            page = self._request("GET", url)
            yield from page.get("items", [])
            token = page.get("nextPageToken")
            if not token:
                return

    def put_object(
        self, bucket: str, name: str, data: bytes, content_type: str = "application/octet-stream"
    ) -> dict:
        """Simple media upload (storage.go Insert parity): one POST to
        the upload endpoint with uploadType=media. For the multi-GB
        binaries the reference shipped this way, production would use
        the resumable protocol; the media path matches the reference's
        single-shot semantics and the sizes it actually uploaded."""
        url = (
            f"{self._UPLOAD_BASE}/b/"
            f"{urllib.parse.quote(bucket)}/o?"
            + urllib.parse.urlencode({"uploadType": "media", "name": name})
        )
        headers = {
            "Authorization": f"Bearer {self._token()}",
            "Content-Type": content_type,
        }
        status, raw = self._transport("POST", url, data, headers)
        if status == 503:
            raise DataprocUnavailableError(f"POST {url} -> 503")
        if not 200 <= status < 300:
            raise RuntimeError(f"POST {url} -> {status}: {raw[:500]!r}")
        return json.loads(raw) if raw else {}

    def delete_object(self, bucket: str, name: str) -> None:
        self._request(
            "DELETE",
            f"{self._BASE}/b/{urllib.parse.quote(bucket)}/o/"
            f"{urllib.parse.quote(name, safe='')}",
        )

    def delete_prefix(self, bucket: str, prefix: str) -> int:
        """storage.go DeletePrefix parity over REST: list (paginated) +
        delete each object; returns how many were deleted. Empty/root
        prefixes are refused — same guard as FsOps.delete_prefix (a
        typo'd empty prefix must not delete the bucket)."""
        if not prefix or prefix in ("/", "*"):
            raise ValueError(f"refusing to delete bucket-wide prefix {prefix!r}")
        # materialize the listing BEFORE deleting: mutating the bucket
        # mid-pagination can skip objects whose page boundary shifted
        # under a deletion-sensitive page token (ADVICE r4)
        names = [obj["name"] for obj in self.list_objects(bucket, prefix)]
        for name in names:
            self.delete_object(bucket, name)
        return len(names)
