"""Pure-Python extraction functions.

Every module here is Spark-free and side-effect-free so the same code runs
(a) inside Arrow-batched ``mapInPandas`` stages on executors and (b) in the
single-process golden generator (``tools/goldens.py``) that pins the
span-sequence-equality contract.
"""
