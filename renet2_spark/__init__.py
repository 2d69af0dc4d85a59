"""renet2_spark — a PySpark-native gene–disease KG-construction engine.

A from-scratch re-expression of the query/data-processing semantics of
sujunhao/RENET2 (reference at /root/reference, cited per-module as
file:line) as declarative Spark DataFrame plans plus a small number of
Arrow-vectorized pandas UDFs. NOT a port: the reference is a
hand-scheduled single-node python pipeline; this engine is a set of
Catalyst-optimizable logical plans designed for 1000-executor clusters.

Layout
------
session.py          SparkSession factory tuned for the engine
schemas.py          explicit StructType schemas (ref has none — SURVEY §1.3)
corpus.py           interleaved text+media span corpus (BASELINE input_hint)
dictionaries.py     gene/disease/omim2mesh/word_index broadcast dictionaries
functions/          scalar text functions (sentence split, tokenize, stats)
operators/          tagger, normalize, pairgen, scorer, neural, ensemble,
                    dedup, similarity, multimodal
plans/              end-to-end pipeline composition (documents → edges)
sources/            readers/writers + per-partition checkpoint/lineage
"""

__version__ = "0.1.0"
