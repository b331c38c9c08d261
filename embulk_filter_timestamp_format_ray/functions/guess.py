"""Timestamp-format guessing over string samples.

The Embulk ecosystem resolves unknown timestamp layouts with a guess pass
(core ``TimestampFormatGuess``; the reference plugin itself takes the
resulting ``from_format`` list as config — README.md:27-64).  This module
is the Ray-side analog: rank a candidate table of strptime layouts by
parse success over a bounded sample, using the repo's OWN scalar parser
(functions/parser.py — the executable spec) as the judge, so a guessed
format is valid for the exact parser that will run it.

Primary consumer: the CDC dead-letter loop —
``CDCPipeline.suggest_dlq_specs()`` groups quarantined rows by schema
epoch, guesses each group's layout, and feeds the result straight to
``reprocess_dlq``.
"""

from __future__ import annotations

from embulk_filter_timestamp_format_ray.functions.parser import TimestampParser

#: candidate layouts, most-specific first (ties in parse-rate resolve to the
#: earlier entry).  %N variants precede their second-resolution prefixes so
#: fractional inputs keep their sub-second digits; zone-bearing variants
#: precede naive ones so offsets aren't silently dropped.
CANDIDATE_FORMATS: "tuple[str, ...]" = (
    "%Y-%m-%d %H:%M:%S.%N %z",
    "%Y-%m-%d %H:%M:%S.%N",
    "%Y-%m-%d %H:%M:%S %z",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%dT%H:%M:%S.%N%z",  # %z also accepts literal 'Z' (ruby semantics)
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S",
    "%Y/%m/%d %H:%M:%S",
    "%d/%b/%Y:%H:%M:%S %z",     # apache common log
    "%a, %d %b %Y %H:%M:%S %z",  # rfc 2822
    "%a %b %e %H:%M:%S %Y",      # asctime
    "%d %b %Y %H:%M:%S",
    "%m/%d/%Y %H:%M:%S",
    "%Y-%m-%d",
    "%Y%m%d%H%M%S",
    "%Y%m%d",
)

#: minimum fraction of the sample a winning format must parse — guessing a
#: layout that fails half the data would quietly requarantine the rest
DEFAULT_MIN_RATE = 0.8


def _plausible_ymd(v: str) -> bool:
    return (v[:2] in ("19", "20", "21")
            and 1 <= int(v[4:6]) <= 12 and 1 <= int(v[6:8]) <= 31)


def _digits_only(values: "list[str]") -> "str | None":
    """Epoch-number detection by digit length: 13+ digits ⇒ millis (%Q),
    otherwise seconds (%s); negatives allowed (pre-1970).  All-8-digit /
    all-14-digit samples that read as plausible yyyymmdd[hhmmss] dates fall
    through to the candidate table instead (compact layouts beat the
    epoch reading there, matching how a human would read '20240105')."""
    stripped = [v[1:] if v.startswith("-") else v for v in values]
    if not all(v.isdigit() for v in stripped):
        return None
    lens = {len(v) for v in stripped}
    if lens == {8} and all(_plausible_ymd(v) for v in stripped):
        return None
    if lens == {14} and all(
            _plausible_ymd(v) and int(v[8:10]) < 24 and int(v[10:12]) < 60
            and int(v[12:14]) < 61 for v in stripped):
        return None
    return "%Q" if max(len(v) for v in stripped) >= 13 else "%s"


def guess_format(samples, default_timezone: str = "UTC",
                 min_rate: float = DEFAULT_MIN_RATE,
                 candidates: "tuple[str, ...]" = CANDIDATE_FORMATS) -> "str | None":
    """Best-fitting strptime layout for ``samples`` (non-null strings), or
    None when nothing reaches ``min_rate``.  Bounded work: callers pass a
    SAMPLE (this is a driver-side helper, never a per-row stage)."""
    values = [s for s in samples if s]
    if not values:
        return None
    epoch_fmt = _digits_only(values)
    if epoch_fmt:
        return epoch_fmt
    best, best_hits = None, 0
    for fmt in candidates:
        parser = TimestampParser([fmt], default_timezone)
        hits = 0
        for v in values:
            try:
                parser.parse(v)
                hits += 1
            except Exception:  # noqa: BLE001 - candidate rejected per value
                continue
        if hits > best_hits:
            best, best_hits = fmt, hits
            if hits == len(values):
                break  # candidates are ordered most-specific-first
    if best is not None and best_hits >= min_rate * len(values):
        return best
    return None
