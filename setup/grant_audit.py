"""A-24 setup utility: app permission grant + site-access audit.

Reference parity (`utility_sp_grant_siteselected.py`):
* check existing grants, grant ``roles:["write"]`` if absent (:56-100)
* access probe — GET the site as the target app (:111-118)
* tenant-wide site list via ``sites?search=*`` (:130-145) — plus
  @odata.nextLink pagination the reference lacks
* accessibility audit (:148-171) — rebuilt as a relational SEMI-JOIN
  (sites ⋉ grants on site id) instead of the reference's per-row
  pandas point updates (A-18).

All network calls go through the injectable fake-transport
``SharePointClient`` (sources/sharepoint.py) so everything is
unit-testable offline (tests/test_grant_audit.py).

Scale note: the per-site permission fetch is an API-shape constraint
(Graph has no tenant-wide grants endpoint).  Here it runs driver-side
(tenant site counts are control-plane sized); for very large tenants
the same fetch loop moves executor-side via mapInPandas over the sites
DataFrame, and the audit join is unchanged.
"""

from __future__ import annotations

from ingest_sharepoint_file_to_fabric_lakehouse_spark.sources.sharepoint import (
    GRAPH,
    SharePointClient,
)


def granted_app_ids(client: SharePointClient, site_id: str) -> list[str]:
    """All application ids granted on a site (reference :56-77)."""
    resp = client._request("get", f"{GRAPH}/sites/{site_id}/permissions")
    if resp.status_code != 200:
        raise RuntimeError(f"permission listing failed: {resp.status_code}")
    ids = []
    for perm in resp.json().get("value", []):
        for grantee in perm.get("grantedToIdentitiesV2", []):
            app_id = grantee.get("application", {}).get("id")
            if app_id:
                ids.append(app_id)
    return ids


def grant_write(
    client: SharePointClient, site_id: str, app_id: str, display_name: str
) -> bool:
    """Idempotent grant: POST ``roles:["write"]`` only when the app has
    no existing grant (reference :80-100).  Returns True iff a new
    grant was created."""
    if app_id in granted_app_ids(client, site_id):
        return False
    resp = client._request(
        "post",
        f"{GRAPH}/sites/{site_id}/permissions",
        json={
            "roles": ["write"],
            "grantedToIdentities": [
                {"application": {"id": app_id, "displayName": display_name}}
            ],
        },
    )
    if resp.status_code != 201:
        raise RuntimeError(f"grant failed: {resp.status_code}")
    return True


def probe_access(client: SharePointClient, site_id: str) -> bool:
    """Access test: can the credential GET the site? (reference
    :111-118)."""
    return client._request("get", f"{GRAPH}/sites/{site_id}").status_code == 200


def list_tenant_sites(client: SharePointClient) -> list[dict]:
    """Tenant-wide site list, ``sites?search=*`` (reference :130-145)
    with @odata.nextLink pagination (reference reads page 1 only)."""
    url = f"{GRAPH}/sites?search=*"
    sites: list[dict] = []
    while url:
        resp = client._request("get", url)
        if resp.status_code != 200:
            raise RuntimeError(f"site listing failed: {resp.status_code}")
        body = resp.json()
        sites.extend(body.get("value", []))
        url = body.get("@odata.nextLink")
    return sites


def site_access_audit(spark, client: SharePointClient, app_id: str):
    """Tenant audit DataFrame: every site + an ``accessible`` flag for
    ``app_id`` — the reference's N+1 pandas point-update loop
    (:152-168) as one relational semi-join (A-18).

    Returns columns (name, lastModifiedDateTime, webUrl, accessible).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    sites = list_tenant_sites(client)
    grants = [
        (s["id"], gid) for s in sites for gid in granted_app_ids(client, s["id"])
    ]
    scols = ["id", "name", "lastModifiedDateTime", "webUrl"]
    sites_df = spark.createDataFrame(
        pd.DataFrame([[s.get(c) for c in scols] for s in sites], columns=scols),
        "id string, name string, lastModifiedDateTime string, webUrl string",
    )
    grants_df = spark.createDataFrame(
        pd.DataFrame(grants or [("", "")], columns=["site_id", "app_id"]),
        "site_id string, app_id string",
    ).filter(F.col("app_id") == app_id)
    accessible = sites_df.join(
        grants_df, sites_df.id == grants_df.site_id, "left_semi"
    ).select("id")
    return (
        sites_df.join(
            accessible.withColumnRenamed("id", "_acc_id"),
            sites_df.id == F.col("_acc_id"),
            "left",
        )
        .select(
            "name",
            "lastModifiedDateTime",
            "webUrl",
            F.when(F.col("_acc_id").isNotNull(), "Yes").otherwise("No").alias("accessible"),
        )
        .orderBy("name")
    )
