"""etdtransform_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Stroomversnelling/etdtransform, plus
LLM-corpus operators (dedup, similarity search, text analysis, multimodal).

See SURVEY.md for the structural analysis of the reference this is built from.
"""

__version__ = "0.1.0"
