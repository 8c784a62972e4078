"""data.gov.sg-style API source (SURVEY.md §2.1 S5).

The reference's ``download_historical_data.py:5-33`` walks a collection:
collection id → dataset ids → per-dataset poll-initiated download → CSV
files on disk, which the Spark job then scans. That driver-side fetch is
not a Spark operator; here it's a thin, dependency-injected fetch step
producing files for the CSV reader — injectable so tests (and this
offline container) use a fake fetcher, while production supplies a
requests-based one.
"""

from __future__ import annotations

import os
from collections.abc import Callable

# fetch_json(url) -> dict ; fetch_bytes(url) -> bytes
FetchJson = Callable[[str], dict]
FetchBytes = Callable[[str], bytes]

COLLECTION_URL = (
    "https://api-production.data.gov.sg/v2/public/api/collections/{collection_id}/metadata"
)
INITIATE_URL = (
    "https://api-open.data.gov.sg/v1/public/api/datasets/{dataset_id}/initiate-download"
)
POLL_URL = "https://api-open.data.gov.sg/v1/public/api/datasets/{dataset_id}/poll-download"


def list_dataset_ids(collection_id: str, fetch_json: FetchJson) -> list[str]:
    meta = fetch_json(COLLECTION_URL.format(collection_id=collection_id))
    return list(
        meta.get("data", {}).get("collectionMetadata", {}).get("childDatasets", [])
    )


def download_dataset_csv(
    dataset_id: str,
    out_dir: str,
    fetch_json: FetchJson,
    fetch_bytes: FetchBytes,
) -> str:
    """initiate → poll for the signed url → download. Returns the local
    CSV path (input to ``read_historical_csv_dir``)."""
    fetch_json(INITIATE_URL.format(dataset_id=dataset_id))
    poll = fetch_json(POLL_URL.format(dataset_id=dataset_id))
    url = poll.get("data", {}).get("url")
    if not url:
        raise RuntimeError(f"dataset {dataset_id}: poll returned no download url")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{dataset_id}.csv")
    with open(path, "wb") as f:
        f.write(fetch_bytes(url))
    return path


def download_collection(
    collection_id: str,
    out_dir: str,
    fetch_json: FetchJson,
    fetch_bytes: FetchBytes,
) -> list[str]:
    return [
        download_dataset_csv(ds, out_dir, fetch_json, fetch_bytes)
        for ds in list_dataset_ids(collection_id, fetch_json)
    ]
