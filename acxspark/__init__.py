"""acxspark — a from-scratch PySpark-native near-duplicate analytics engine.

Re-expresses the validate / normalize / dedup / redact loop of the
reference CLI (AUSP59/acx-contact-cli, see SURVEY.md) as declarative
DataFrame stages over a Common-Crawl-style web-page table, extending
its documented-but-unimplemented fuzzy dedup (reference README.md:36,
53,119,194) into MinHash/LSH + SimHash + containment verification with
connected-components cluster assignment.

Design stance (SURVEY.md §7.0): DataFrame/SQL only, Arrow-vectorized
pandas UDFs where columnar built-ins cannot express the semantics, no
RDDs, no per-row Python UDFs.
"""

from acxspark.config import DedupConfig
from acxspark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
