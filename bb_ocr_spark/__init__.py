"""bb_ocr_spark — a from-scratch, PySpark-native document extraction engine.

Re-expresses the capabilities of the reference extraction pipeline
(adamnelsonarcher/BB-OCR, studied read-only at /root/reference) as an
idiomatic Spark job over an interleaved text+media documents table:

    documents_interleaved(doc_id: string,
                          spans: array<struct<kind:string, text:string,
                                              media_ref:string, offset:int>>)

Core pipeline (see plans/extract_job.py): main-content extraction
(boilerplate strip via link-density + text-density heuristics), reading-order
recovery (offset sort), span-sequence reassembly with media refs interleaved
at their original offsets, heuristic metadata extraction, enrichment joins,
per-partition lineage/metrics, and anti-join resume.

Everything is DataFrame API + Arrow-vectorized pandas UDFs — no per-row
Python, no RDDs.
"""

__version__ = "0.1.0"
