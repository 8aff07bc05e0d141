"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `pdahiyax/applications.analytics.midas.hbase-metrics`
(surveyed in SURVEY.md; all reference citations point into /root/reference).

Architecture: everything is declared with the DataFrame/SQL API so Catalyst
plans the physical execution (pushdown, pruning, join selection, AQE).  The
reference's HBase cell store becomes a salt-partitioned Parquet DataFrame;
its bulkGet becomes an equi-join; its driver-side lookups become broadcast
joins.  See SURVEY.md section 2 for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
