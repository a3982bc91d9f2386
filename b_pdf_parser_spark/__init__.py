"""b_pdf_parser_spark — PySpark-native document-content extraction engine.

From-scratch rebuild (Spark-first, not a port) of the capabilities of the
reference single-machine pipeline ``rager306/b-pdf-parser``: PDF object-model
text extraction, HTML boilerplate stripping, bank-statement field extraction,
turnover verification, batch metrics — re-expressed as DataFrame plans +
Arrow-vectorized ``mapInPandas`` batches, plus the web-scale operator pack
(dedup, similarity search, text analysis) a 100 TB training-data pipeline
needs.
"""

__version__ = "0.1.0"
