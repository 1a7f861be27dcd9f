"""Pipeline layer: the reference's three entry points re-expressed as
Spark plans over the operator layer (SURVEY.md §3, §7.1.6).

- ``export``: scan → find-first resolve → dimension expansion → sorted,
  partitioned Parquet + manifests (reference export_dp1.py / exporter.py).
- ``importer``: toposorted dimension load, anti-join skip_existing, per-run
  dataset chunks, association dispatch with certify validation, datastore
  path remapping — all published atomically (reference import_dp1.py /
  importer.py).
- ``file_tree``: path rewriting + idempotent symlink-farm sink
  (reference generate_dp1_file_tree.py).
- ``catalog``: the staging + manifest-swap transaction protocol both
  pipelines publish through (G3).
"""

from .catalog import Catalog, Transaction  # noqa: F401
from .curation import curate_documents, run_curation  # noqa: F401
from .export import run_export  # noqa: F401
from .file_tree import generate_file_tree  # noqa: F401
from .importer import run_import  # noqa: F401
