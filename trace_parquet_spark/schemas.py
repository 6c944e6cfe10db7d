"""Schemas of the faithful core (SURVEY §1.4).

Input mirrors the reference table ``TD_FD_TRACE_PARAM``
(reference: src/main/resources/schema.sql:14-19, README.md:38-44);
output mirrors ``ParameterRecord.avsc``
(reference: src/main/resources/avro/ParameterRecord.avsc:5-10).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: PARAM_INDEX NUMBER, START_TIME TIMESTAMP, END_TIME TIMESTAMP,
# TRACE_DATA BLOB (gzip-compressed UTF-8 JSON).
TRACE_PARAM_SCHEMA = T.StructType(
    [
        T.StructField("paramIndex", T.LongType(), False),
        T.StructField("startTime", T.TimestampType(), True),
        T.StructField("endTime", T.TimestampType(), True),
        T.StructField("traceData", T.BinaryType(), True),
    ]
)

# Output: all four fields required, traceData decompressed to string.
TRACE_EXPORT_SCHEMA = T.StructType(
    [
        T.StructField("paramIndex", T.LongType(), False),
        T.StructField("startTime", T.TimestampType(), False),
        T.StructField("endTime", T.TimestampType(), False),
        T.StructField("traceData", T.StringType(), False),
    ]
)

# Semi-structured payload union schema observed in the reference seed
# rows (reference: config/DataInitializer.java:40-42).
TRACE_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("value", T.LongType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("temp", T.DoubleType(), True),
        T.StructField("pressure", T.DoubleType(), True),
    ]
)
