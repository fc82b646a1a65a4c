"""Custom operators the reference implies but Spark lacks as built-ins:
recursive text splitting, MinHash/SimHash dedup, k-NN variants (exact /
LSH / IVF), deterministic embedding, sessionization. Each is composed
from DataFrame ops where semantics allow; Arrow-batched Pandas UDFs only
where genuinely needed (the splitter's stateful overlap logic).
"""
