"""Error semantics of the reference API (SURVEY §2.11).

Exact messages matter: the reference's controller tests assert them
(reference: test DataExportControllerTest.java:99,114,129,151).
"""

from __future__ import annotations


class TraceParquetError(Exception):
    """Base class; maps to HTTP 500 in the API layer (E4)."""

    status = 500


class NoDataFoundError(TraceParquetError):
    """Empty result (E1) — reference returns HTTP 404.

    (reference: exception/NoDataFoundException.java:9-14)
    """

    status = 404
    MESSAGE = "No data found for the given criteria."

    def __init__(self, message: str = MESSAGE):
        super().__init__(message)


class ValidationError(TraceParquetError):
    """Bad request (E2/E3) — reference returns HTTP 400."""

    status = 400
