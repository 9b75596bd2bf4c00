"""imdedup_plus_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine with the capabilities of DDDCai/imDedup_plus,
recast over Common-Crawl-style web text.

Pipeline (SURVEY.md §3.1 step 5):

documents -> valid_documents -> with_signature -> explode_bands
          -> candidate_pairs -> verify_pairs -> clusters_from_pairs
          -> extract_spans -> metrics / sinks
"""

from .config import DedupConfig, REFERENCE_CONFIG  # noqa: F401
