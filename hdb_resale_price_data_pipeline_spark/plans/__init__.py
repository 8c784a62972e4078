"""The reference's four pipelines, recomposed from the operator library
(SURVEY.md §3). Each is a pure ``DataFrame → DataFrame`` function — the
orchestration (Airflow/GCS/Dataproc in the reference) is replaced by the
thin runner in ``runner.py`` and by the test harness.
"""

from .historical import historical_pipeline
from .propnex import propnex_pipeline
from .srx import srx_pipeline
from .merge import merge_dedup_pipeline

__all__ = [
    "historical_pipeline",
    "propnex_pipeline",
    "srx_pipeline",
    "merge_dedup_pipeline",
]
