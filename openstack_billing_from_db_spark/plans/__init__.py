from openstack_billing_from_db_spark.plans.billing import (  # noqa: F401
    instance_runtime,
    nova_invoice,
    invoice_csv_rows,
    testdata_billing_tables,
)
