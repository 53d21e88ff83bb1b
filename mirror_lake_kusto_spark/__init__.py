"""mirror_lake_kusto_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Azure/mirror-lake-kusto.

The reference (read-only at /root/reference/) is a .NET CLI that mirrors
Delta Lake tables into Kusto and pushes its relational work to the Kusto
cluster as KQL.  This package re-expresses that entire computational
surface — Delta-source incremental mirroring, the emitted-KQL operator
inventory, and large-scale training-data-pipeline extensions — as
idiomatic PySpark DataFrame programs.

Layout:
    session        tuned SparkSession builder (local test / cluster posture)
    schema         Delta <-> Kusto <-> Spark type mapping (SURVEY §1.2)
    sources/       Delta transaction-log reader, table loaders
    plans/         mirror state machine (TransactionItem state table)
    mirror         the incremental mirror pipeline (SURVEY §3)
    operators/     relational + extension operators (dedup, similarity, text)
    functions/     KQL-flavored scalar function mappings (SURVEY §2.H)
    streaming/     structured-streaming surface (SURVEY §2.I)
    queries/       the §2 inventory as named, oracle-checked queries
"""

__version__ = "0.1.0"
