"""PII scrubbing: regex redaction of emails / phone numbers / IP
addresses in a text column — the standard pre-training privacy pass.

Pure ``regexp_replace`` chains: JVM-side, codegen'd, shuffle-free — a
narrow projection that at 100 TB costs one scan.  The patterns are the
conservative Dolma/CCNet-style ones (precision over recall: a missed
rare format beats mass false redaction of ordinary numbers).

Each masked category uses a distinct fixed token so downstream filters
can count redactions per category (``scrub_stats``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# order matters: emails first (their digits/dots must not be half-eaten
# by later patterns), then IPs (a dotted quad would otherwise match the
# loose phone separators), phones last
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "|||EMAIL|||"),
    ("ip", r"(?<![0-9.])(?:[0-9]{1,3}\.){3}[0-9]{1,3}(?![0-9.])",
     "|||IP|||"),
    ("phone", r"(?<![0-9])(?:\+?[0-9]{1,3}[-. ])?(?:\([0-9]{2,4}\)[-. ]?)?"
              r"[0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{3,4})?(?![0-9])",
     "|||PHONE|||"),
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              categories: list[str] | None = None) -> DataFrame:
    """Replace PII spans in *text_col* with category mask tokens."""
    out = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        if categories is None or name in categories:
            out = F.regexp_replace(out, pat, token)
    return df.withColumn(text_col, out)


def scrub_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document redaction counts: ``(id, n_email, n_ip, n_phone)``.

    Counts follow the same sequential masking order as :func:`scrub_pii`
    (each pattern counted on the text with earlier categories already
    masked), so the counts equal the redactions the scrub performs —
    counting all patterns on the raw text would double-count (an IP also
    matches the loose phone separators)."""
    cols = [F.col(id_col)]
    cur = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select(*cols)
