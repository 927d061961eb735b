from stream4flow_spark.functions.net import (  # noqa: F401
    cidr_range,
    ip4_to_long,
    ip_coalesce,
    ip_in_cidr,
    ms_to_iso,
    protocol_name,
    tcp_flag_bit,
    tcp_flags_struct,
)
