"""PySpark-native retail inventory reconciliation + analytics engine.

A clean-room, Spark-first re-design of the capabilities of the reference
repo ``AravantiYashwanth/Retail-Inventory-Reconciliation-Batch-ETL-Pipeline-on-AWS-``
(medallion batch ETL: stage POS sales -> build product dim -> 3-way join
reconciliation -> warehouse load + alerting), extended with large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is declarative DataFrame/SQL so Catalyst owns the physical
plan; the only Python-on-executor paths are clearly-marked Pandas UDF
operators where built-ins cannot express the semantics.
"""

__version__ = "0.1.0"
