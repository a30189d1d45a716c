"""SharePoint (Microsoft Graph) connector — the engine's adapter for
the reference's actual source system, slotting into the same
interface as the local-directory mock in `ingest.py`.

Reference parity (sharepoint_to_bronze_delta.py / utility script):
* client-credentials auth (A-22, :16-33) — plus expiry-aware refresh,
  which the reference lacks (token fetched once at :261).
* site-id / drive-id resolution (A-23, :51-69).
* folder-children listing (A-1, :72-77) — plus @odata.nextLink
  pagination and retry/backoff, both absent in the reference.
* archive copy / original delete / ensure-folder (A-5/A-6/A-7,
  :80-109) — exposed as post-commit actions for the ingest pipeline.
* the drive-name and is-file filters (A-8/A-9, :66,140).

Design: the driver runs only control-plane calls (listing, ids);
content transfer happens executor-side via
``download_batch``/mapInPandas so file bytes never transit the driver
(the reference buffers whole files in driver RAM, :163-171).

Everything network-facing takes an injectable ``transport`` (a
``requests.Session``-shaped object) so the logic is unit-testable
offline; ``requests`` itself is import-gated.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

try:  # pragma: no cover - exercised only with network access
    import requests

    HAVE_REQUESTS = True
except ImportError:
    requests = None
    HAVE_REQUESTS = False

GRAPH = "https://graph.microsoft.com/v1.0"
LOGIN = "https://login.microsoftonline.com"


@dataclass
class GraphAuth:
    """Client-credentials token provider with expiry-aware refresh
    (reference acquires one token for the whole run, :261 — fails on
    long transfers)."""

    tenant_id: str
    client_id: str
    client_secret: str
    transport: object = None
    _token: str | None = field(default=None, repr=False)
    _expires_at: float = 0.0

    def token(self, now: float | None = None) -> str:
        now = time.time() if now is None else now
        if self._token is None or now >= self._expires_at - 60:
            t = self.transport or requests
            resp = t.post(
                f"{LOGIN}/{self.tenant_id}/oauth2/v2.0/token",
                data={
                    "grant_type": "client_credentials",
                    "client_id": self.client_id,
                    "client_secret": self.client_secret,
                    "scope": "https://graph.microsoft.com/.default",
                },
            )
            if resp.status_code != 200:
                raise RuntimeError(f"token acquisition failed: {resp.status_code}")
            body = resp.json()
            self._token = body["access_token"]
            self._expires_at = now + float(body.get("expires_in", 3600))
        return self._token


class SharePointClient:
    """Control-plane Graph client: id resolution, listing, archive ops.

    ``transport`` is any object with requests-style ``get/post/delete``
    returning objects with ``.status_code``/``.json()``.
    """

    def __init__(self, auth: GraphAuth, transport: object = None, max_retries: int = 4):
        self.auth = auth
        self.transport = transport or requests
        self.max_retries = max_retries

    # -- low-level --------------------------------------------------
    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.auth.token()}"}

    def _request(self, method: str, url: str, **kw):
        """Retry with exponential backoff on 429/5xx (reference does a
        single attempt and skips the file, :213-218)."""
        delay = 1.0
        for attempt in range(self.max_retries + 1):
            resp = getattr(self.transport, method)(url, headers=self._headers(), **kw)
            if resp.status_code in (429, 500, 502, 503, 504) and attempt < self.max_retries:
                retry_after = getattr(resp, "headers", {}).get("Retry-After")
                time.sleep(float(retry_after) if retry_after else delay)
                delay *= 2
                continue
            return resp
        return resp  # pragma: no cover

    # -- id resolution (A-23) --------------------------------------
    def get_site_id(self, hostname: str, site_path: str) -> str:
        resp = self._request("get", f"{GRAPH}/sites/{hostname}:/sites/{site_path}")
        if resp.status_code != 200:
            raise RuntimeError(f"site lookup failed: {resp.status_code}")
        return resp.json()["id"]

    def get_document_drive_id(self, site_id: str) -> str:
        """First drive not named 'Teams Wiki Data' (A-8, :66)."""
        resp = self._request("get", f"{GRAPH}/sites/{site_id}/drives")
        if resp.status_code != 200:
            raise RuntimeError(f"drive listing failed: {resp.status_code}")
        drives = resp.json().get("value", [])
        drive = next((d for d in drives if d.get("name") != "Teams Wiki Data"), None)
        if drive is None:
            raise RuntimeError("no document drive found")
        return drive["id"]

    # -- listing (A-1) with pagination ------------------------------
    def list_folder_children(self, drive_id: str, folder: str) -> list[dict]:
        url = f"{GRAPH}/drives/{drive_id}/root:/{folder}:/children"
        items: list[dict] = []
        while url:
            resp = self._request("get", url)
            if resp.status_code != 200:
                raise RuntimeError(f"folder listing failed for {folder}: {resp.status_code}")
            body = resp.json()
            items.extend(body.get("value", []))
            url = body.get("@odata.nextLink")  # reference reads page 1 only
        return items

    def manifest_rows(self, drive_id: str, folders: list[str]) -> list[dict]:
        """Listing → manifest rows (A-9 is-file filter + A-10
        projection), same shape as ingest.list_source_files."""
        rows = []
        for folder in folders:
            for it in self.list_folder_children(drive_id, folder):
                if "file" not in it:  # A-9
                    continue
                rows.append(
                    {
                        "file_name": it["name"],
                        "folder_name": folder,
                        "file_path": it.get("@microsoft.graph.downloadUrl", ""),
                        "size_bytes": int(it.get("size", 0)),
                    }
                )
        return rows

    # -- post-commit actions (A-5/A-6/A-7) -------------------------
    def ensure_folder(self, drive_id: str, path: str) -> None:
        resp = self._request("get", f"{GRAPH}/drives/{drive_id}/root:/{path}")
        if resp.status_code == 200:
            return
        parent, _, child = path.rpartition("/")
        base = f"{GRAPH}/drives/{drive_id}/root:/{parent}:/children" if parent else f"{GRAPH}/drives/{drive_id}/root/children"
        resp = self._request(
            "post",
            base,
            json={"name": child, "folder": {}, "@microsoft.graph.conflictBehavior": "replace"},
        )
        if resp.status_code not in (200, 201):
            raise RuntimeError(f"ensure_folder failed: {resp.status_code}")

    def copy_to_archive(self, drive_id: str, folder: str, name: str, archive_path: str, archive_name: str) -> None:
        resp = self._request(
            "post",
            f"{GRAPH}/drives/{drive_id}/root:/{folder}/{name}:/copy",
            json={
                "parentReference": {"driveId": drive_id, "path": f"/drives/{drive_id}/root:/{archive_path}"},
                "name": archive_name,
            },
        )
        if resp.status_code not in (200, 202):
            raise RuntimeError(f"archive copy failed: {resp.status_code}")

    def delete_original(self, drive_id: str, folder: str, name: str) -> None:
        resp = self._request("delete", f"{GRAPH}/drives/{drive_id}/root:/{folder}/{name}")
        if resp.status_code != 204:
            raise RuntimeError(f"delete failed: {resp.status_code}")


def download_batch(url_series, transport: object = None):
    """Executor-side content fetch for mapInPandas: takes a pandas
    Series of pre-authorized download URLs, yields bytes.  Runs on
    executors — content never passes through the driver (fixes
    :163-171)."""
    t = transport or requests
    out = []
    for url in url_series:
        resp = t.get(url)
        if resp.status_code != 200:
            out.append(None)  # dead-letter row (A-21), not an exception
        else:
            out.append(resp.content)
    return out
