"""jsonld_spark — PySpark-native JSON-LD knowledge-graph construction engine.

Architecture (SURVEY.md §1.3/§7): a pure-Python algorithm core
(``jsonld_spark.core``) applied per document inside Arrow-vectorized
Spark stages (``jsonld_spark.operators``), producing an exploded
columnar triples DataFrame that downstream operators (entity linking,
canonicalization, materialization) transform with built-in DataFrame
ops wherever possible.
"""

__version__ = "0.1.0"
