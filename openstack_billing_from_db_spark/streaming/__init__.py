from openstack_billing_from_db_spark.streaming.sessions import (  # noqa: F401
    run_stream_to_memory,
    stream_events,
    streaming_state_intervals,
    windowed_event_counts,
)
