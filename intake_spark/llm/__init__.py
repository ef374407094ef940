"""LLM-data-pipeline operators (beyond the reference surface).

The reference only ships LLM *service* readers (llama.cpp / OpenAI
completion+embedding, intake/readers/readers.py:583-833). This package adds
the data-side operators a 100 TB training-data pipeline needs, each designed
Spark-first:

- :mod:`intake_spark.llm.text` — tokenization, quality scoring, language-ID,
  fingerprinting (all JVM-side ``pyspark.sql.functions``; no Python UDFs).
- :mod:`intake_spark.llm.dedup` — exact, MinHash+LSH, SimHash, n-gram
  Jaccard dedup.
- :mod:`intake_spark.llm.similarity` — brute-force and LSH-bucketed cosine
  ANN over embedding columns.
- :mod:`intake_spark.llm.multimodal` — opaque-binary media columns with
  typed metadata and Arrow-batched decode plumbing (decoders stubbed:
  image/audio libs are not in this container).
"""
