"""PII detection + redaction primitives — the governance stage every
LLM training-data pipeline runs before release: find emails, phone
numbers, and IPv4 addresses in free text, count them per document, and
replace them with typed placeholder tokens.

Pure built-in regex expressions (regexp_count / regexp_replace), so
both detection and redaction are scan-local — no UDF, no shuffle — and
the DuckDB oracle evaluates the identical patterns (SQL twins below,
the ``functions.text.h60_sql`` discipline). Patterns stay in the
common RE2 ∩ java.util.regex subset and are written to be
quantifier-unambiguous, so leftmost-first matching yields the same
spans in both engines.

The pattern set is deliberately the high-precision core (the
Presidio/CommonCrawl-pipeline defaults), not a kitchen sink: false
positives in redaction destroy training text, so each pattern anchors
on structure (@-domain, +CC (area) exchange, dotted quads) rather than
bare digit runs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# local-part@domain.tld — tld >= 2 alpha chars
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
# +CC (AAA) NNN... — the unambiguous international-format core
PHONE_RE = "\\+[0-9]{1,2} \\([0-9]{3}\\) [0-9]{3,8}"
# dotted quad; [0-9]{1,3} per octet (syntactic, not range-validated)
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

# redaction order is part of the contract: emails first (they can
# contain digits a later pass must not see), then phones, then IPs
REDACTIONS = (
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-row match counts for each PII class (non-overlapping,
    leftmost-first — identical in RE2 and java.util.regex for these
    unambiguous patterns).

    Overlap semantics: each class counts INDEPENDENTLY on the RAW
    text, while :func:`redact_pii` applies the classes in REDACTIONS
    order — so text matching two classes (an email whose domain is a
    dotted quad, e.g. ``a@1.2.3.4``-shaped strings that also satisfy
    IPV4_RE) counts in BOTH classes but is redacted only under the
    FIRST matching class. Consequence: ``n_ipv4 > 0`` does not imply
    an ``[IP]`` token appears in the redacted string. Counts are
    detection statistics, not placeholder-token counts — don't
    reconcile them against the redacted output."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
        "n_ipv4": F.regexp_count(text, F.lit(IPV4_RE)),
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed placeholder, in the
    REDACTIONS order."""
    out = text
    for pat, token in REDACTIONS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts_sql(expr: str) -> dict[str, str]:
    """DuckDB twins of :func:`pii_counts` (len(regexp_extract_all) ==
    non-overlapping match count)."""
    return {
        "n_emails": f"len(regexp_extract_all({expr}, '{EMAIL_RE}'))",
        "n_phones": f"len(regexp_extract_all({expr}, '{PHONE_RE}'))",
        "n_ipv4": f"len(regexp_extract_all({expr}, '{IPV4_RE}'))",
    }


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of :func:`redact_pii` ('g' = replace all, matching
    Spark's regexp_replace default)."""
    out = expr
    for pat, token in REDACTIONS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out
