"""columnstore_spark — a from-scratch PySpark-native per-column
lightweight-compression engine (dict+RLE, FSST symbol table, bit-pack,
frame-of-reference, delta) with codec auto-selection, re-expressing the
capabilities of JorgeCandeias/ColumnStore (reference at /root/reference)
as a distributed encode/decode transform over transcript tables.

Layers:
- ``codecs``     pure numpy/pyarrow codec kernels + stats + chooser
- ``operators``  Spark encode/decode/verify/resume stages
- ``sources``    transcript builders/generators + warehouse storage
- ``functions``  training-data pipeline ops (dedup, similarity, text)
"""

__version__ = "0.1.0"
