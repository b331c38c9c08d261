"""Ruby strftime format → Java (Joda-style) pattern conversion.

Reference: /root/reference/src/main/java/org/embulk/filter/timestamp_format/
TimestampFormatConverter.java:57-134.  Used only for the *parser* fast path
(the ``timestamp_parser: auto_java`` option, ColumnCaster.java:76-90): formats
the table cannot fully convert keep the ruby parser.

Returns ``None`` when any ``%`` survives conversion (give-up semantics,
TimestampFormatConverter.java:126-133).
"""

from __future__ import annotations

import re

RUBY_TO_JAVA_FORMAT_TABLE: dict[str, str] = {
    "A": "EEEE",
    "a": "EEE",
    "B": "MMMM",
    "b": "MMM",
    "C": "CC",
    "c": "EEE MMM dd HH:mm:ss yyyy",
    "D": "MM/dd/yy",
    "d": "dd",
    "e": "dd",
    "F": "yyyy-MM-dd",
    "H": "HH",
    "h": "MMM",
    "I": "hh",
    "j": "DDD",
    "L": "SSS",
    "M": "mm",
    "m": "MM",
    "N": "nnnnnnnnn",
    "P": "a",
    "p": "a",
    "R": "HH:mm",
    "r": "hh:mm:ss a",
    "S": "ss",
    "T": "HH:mm:ss",
    "U": "w",
    "u": "e",
    "v": "dd-MMM-yyyy",
    "V": "w",
    "W": "w",
    "w": "e",
    "X": "HH:mm:ss",
    "x": "MM/dd/yy",
    "Y": "yyyy",
    "y": "yy",
    "Z": "z",
    "z": "Z",
}

_IDENTIFIER_PATTERN = re.compile(
    "%[-_^#0-9:]*([" + re.escape("".join(RUBY_TO_JAVA_FORMAT_TABLE)) + "])"
)
# quote whitespace-delimited tokens that do not start with '%' as literals
_NON_IDENTIFIER_PATTERN = re.compile(r"(^|\s)([^%\s]\S*)")


def to_java_format(ruby_format: str) -> str | None:
    """Convert a ruby format to a Joda-style pattern; None when impossible."""
    quoted = _NON_IDENTIFIER_PATTERN.sub(lambda m: f"{m.group(1)}'{m.group(2)}'", ruby_format)
    java = _IDENTIFIER_PATTERN.sub(
        lambda m: RUBY_TO_JAVA_FORMAT_TABLE[m.group(1)], quoted
    )
    if "%" in java:
        return None
    return java
