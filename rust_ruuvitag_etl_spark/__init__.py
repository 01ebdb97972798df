"""PySpark-native analytics engine with the capabilities of
JuusoPaju/rust-ruuvitag-etl (reference surveyed in SURVEY.md), extended
with a general relational query surface and LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis).

Spark-first design: every operator is declared with the DataFrame/SQL
API so Catalyst/Tungsten choose the physical plan; Python UDFs appear
only where builtins cannot express the semantics (Arrow-batched pandas
UDFs, never row-at-a-time in a hot path).
"""

__version__ = "0.1.0"
