"""postal_address_spark — a from-scratch PySpark-native entity-resolution
engine lifting the semantics of scaleway/postal-address (reference at
/root/reference, studied not copied) into a blocking + pairwise-scoring +
transitive-clustering record-linkage pipeline over conversation-transcript
tables, per BASELINE.json's north rule.
"""
__version__ = "0.1.0"
