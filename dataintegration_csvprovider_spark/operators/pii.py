"""PII detection and redaction over a text column — the scrub pass every
production pretraining pipeline runs before release (the BigScience ROOTS /
Dolma recipe: regex detectors for contact-info classes, checksum validation
where the class has one, typed-mask replacement).

Reference analog: none — the reference connector ships rows verbatim
(``CSVProvider.cs:563-577``); this is north-star LLM-pipeline surface.

Everything is JVM-side Column algebra (regexp_count / regexp_extract_all /
regexp_replace / array folds) — no Python UDF anywhere, so the detectors
ride whole-stage codegen and scale with the scan. The Luhn checksum is an
integer fold over the candidate's digits (``F.transform`` with index +
``F.aggregate``), bit-identical to the oracle's ``list_transform`` /
``list_sum`` replay: validity is COMPUTED by both engines on every
candidate, never assumed from the fixture.

Classes (kept RE2-compatible so DuckDB replays the exact same automaton —
no lookaround, no backreferences):

- ``email``  — RFC-ish local@domain.tld
- ``phone``  — NANP-shaped ``ddd-ddd-dddd``
- ``ipv4``   — dotted quad, candidates vs octet-validated (<= 255) counted
  separately (the lookalike ``300.1.2.3`` is a candidate, not valid)
- ``card``   — 13-16 contiguous digits, Luhn-partitioned into valid /
  failing candidates

Redaction is conservative (mask every candidate, valid or not — the
standard scrub posture: a lookalike leaks nothing when masked, a missed
true positive does) and ordered email -> phone -> ipv4 -> card. The
classes CAN overlap at the candidate level (``@`` is a word boundary, so
a card- or phone-shaped email local part like ``4111111111111111@x.co``
matches both its own class and email); because the replace chain feeds
each stage the output of the previous one, a candidate consumed by an
earlier mask never reaches a later pattern — and ``n_redacted`` counts
each pattern against that same chain input, so it equals the number of
masks actually applied.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ._util import spread as _spread

#: class name -> (pattern, typed mask), in redaction order
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "card": (r"\b\d{13,16}\b", "<CARD>"),
}


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over a digits-only string Column (boolean).

    Fold from the rightmost digit: double every second digit (0-based odd
    index after reversal), subtract 9 when the double exceeds 9, sum
    mod 10 == 0. Pure integer arithmetic — engine-portable by
    construction.
    """
    rev = F.reverse(candidate)
    digits = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.ascii(F.substring(rev, i, F.lit(1))) - F.lit(48),
    )
    adjusted = F.transform(
        digits,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2),
        ).otherwise(d),
    )
    total = F.aggregate(adjusted, F.lit(0), lambda acc, x: acc + x)
    return total % 10 == 0


def ipv4_valid(candidate: Column) -> Column:
    """All four octets of a dotted-quad candidate are <= 255 (boolean).

    The regex admits ``999.0.0.1``-shaped lookalikes; this is the range
    check that separates candidates from real addresses.
    """
    octets = F.split(candidate, r"\.")
    return F.size(
        F.filter(octets, lambda o: o.cast("int") <= F.lit(255))
    ) == F.lit(4)


def pii_audit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row PII census: candidate and validated counts per class plus
    a ``has_pii`` flag (any candidate in any class — the conservative
    release gate).

    One projection over the scan — counts via ``regexp_count``, the
    validated variants via ``regexp_extract_all`` + an array filter
    running the checksum/range check per candidate. All codegen'd.
    """
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(PII_PATTERNS["email"][0]))
    n_phone = F.regexp_count(t, F.lit(PII_PATTERNS["phone"][0]))
    ip_cands = F.regexp_extract_all(t, F.lit(PII_PATTERNS["ipv4"][0]), 0)
    card_cands = F.regexp_extract_all(t, F.lit(PII_PATTERNS["card"][0]), 0)
    n_card = F.size(card_cands)
    n_card_valid = F.size(F.filter(card_cands, luhn_valid))
    return _spread(df).select(
        "*",
        n_email.cast("bigint").alias("n_email"),
        n_phone.cast("bigint").alias("n_phone"),
        F.size(ip_cands).cast("bigint").alias("n_ip_candidates"),
        F.size(F.filter(ip_cands, ipv4_valid))
        .cast("bigint")
        .alias("n_ip_valid"),
        n_card.cast("bigint").alias("n_card_candidates"),
        n_card_valid.cast("bigint").alias("n_card_valid"),
        (n_card - n_card_valid).cast("bigint").alias("n_card_luhn_fail"),
        (
            (n_email + n_phone + F.size(ip_cands) + n_card) > F.lit(0)
        ).alias("has_pii"),
    )


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Typed-mask redaction: every candidate of every class replaced by
    its mask, in the fixed class order, plus the total replacement count.

    Chained ``regexp_replace`` — one codegen'd projection, no UDF. Each
    pattern is COUNTED against the same progressively-redacted string it
    is replaced in, so ``n_redacted`` equals the number of masks actually
    applied even when candidate classes overlap (e.g. a card-shaped email
    local part is consumed by the email mask and never double-counted by
    the card stage). Chain order is therefore semantic: earlier classes
    win overlaps.
    """
    red = F.col(text_col)
    n_total = F.lit(0)
    for pattern, mask in PII_PATTERNS.values():
        n_total = n_total + F.regexp_count(red, F.lit(pattern))
        red = F.regexp_replace(red, pattern, mask)
    return _spread(df).select(
        "*",
        red.alias(out_col),
        n_total.cast("bigint").alias("n_redacted"),
    )
