"""Pure-Python/pandas per-document extraction kernel.

No Spark imports here: everything is unit-testable standalone and is
invoked from Spark exclusively through Arrow-batched ``mapInPandas``
(operators/extraction.py). The kernel is "batched tokenize+classify":
DOM parsing is per-document (unavoidable), but cell micro-typing is
vectorized with pandas regex over ALL cells of ALL tables in an Arrow
batch at once, and table features (orientation variance, type-distance
means) are numpy matrix ops over a precomputed 16x16 distance matrix.
"""
