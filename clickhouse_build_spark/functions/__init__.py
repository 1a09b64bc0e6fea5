from clickhouse_build_spark.functions.dialect import (
    coalesce_sum0,
    empty_,
    if_,
    if_empty_label,
    month_start,
    round2,
    to_date_,
    to_f64,
    total_order,
)

__all__ = [
    "round2",
    "coalesce_sum0",
    "empty_",
    "if_",
    "if_empty_label",
    "month_start",
    "to_date_",
    "to_f64",
    "total_order",
]
