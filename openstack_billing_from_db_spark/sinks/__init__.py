from openstack_billing_from_db_spark.sinks.csv import (  # noqa: F401
    invoice_s3_keys,
    write_single_csv,
)
