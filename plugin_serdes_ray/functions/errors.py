"""Error-containment policy — the reference's whole data-fault-tolerance
story (/root/reference serdes/OnBadLines.java:6-19, applied e.g.
csv/CsvToIon.java:200-210 and avro/AvroConverter.java:167-171):

ERROR raises with row/field context; WARN logs and nulls/skips; SKIP
silently nulls/skips. Messages truncate at 250 chars like
AvroConverter.java:619-627.
"""

from __future__ import annotations

import enum
import logging

logger = logging.getLogger("plugin_serdes_ray")

MSG_LIMIT = 250


class OnBadLines(str, enum.Enum):
    ERROR = "ERROR"
    WARN = "WARN"
    SKIP = "SKIP"


class BadLineError(ValueError):
    """Raised under OnBadLines.ERROR with row/field context."""


def truncate(msg: str, limit: int = MSG_LIMIT) -> str:
    return msg if len(msg) <= limit else msg[: limit - 3] + "..."


def handle_bad(policy: OnBadLines | str, msg: str) -> bool:
    """Apply the policy to one bad record. Returns True if the record should
    be dropped/nulled, raises under ERROR."""
    policy = OnBadLines(policy)
    if policy is OnBadLines.ERROR:
        raise BadLineError(truncate(msg))
    if policy is OnBadLines.WARN:
        logger.warning(truncate(msg))
    return True
