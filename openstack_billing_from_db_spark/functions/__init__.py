from openstack_billing_from_db_spark.functions.su import (  # noqa: F401
    parse_pci_requests,
    service_unit_columns,
    service_units_expr,
)
from openstack_billing_from_db_spark.functions.money import round_money  # noqa: F401
