"""openstack_billing_from_db_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query semantics of
CCI-MOC/openstack-billing-from-db (reference read-only at /root/reference)
as idiomatic Spark DataFrame plans, designed for 100 TB scale:

- interval sessionization of an event log (reference model.py:90-156)
  via one window-function pass instead of a per-row Python state machine,
- clamped time-overlap aggregation with outage exclusion
  (reference billing.py:88-102) via literal-array interval math
  (zero extra shuffles), and
- pricing/ceiling/grouped-sum invoice generation (reference
  billing.py:116-224) as a single declarative DAG.

Beyond reference parity, the engine ships large-scale training-data
pipeline operators: exact/MinHash/SimHash deduplication, embedding
similarity search, text analysis, and multimodal binary-column plumbing.
"""

__version__ = "0.1.0"

from openstack_billing_from_db_spark.session import get_spark  # noqa: F401
