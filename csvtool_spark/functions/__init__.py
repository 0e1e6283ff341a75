from csvtool_spark.functions.scalar import (  # noqa: F401
    between_halfopen,
    csv_div,
    csv_like,
    csv_week,
    dayname,
    inc,
    monthname,
)
