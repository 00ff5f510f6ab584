"""Rule-based PII scrubbing — the redaction pass every public
training-data pipeline runs before anything else sees the text
(emails/phones/SSNs/IPs; cf. the C4 and RefinedWeb cleaning recipes).

Both engines (this module and the DuckDB oracle twin in
:func:`pii_oracle_sql`) use RE2-compatible patterns, count matches on
the ORIGINAL text (the pattern classes are mutually disjoint, so
counting is order-independent), and redact by applying the replaces in
the fixed EMAIL → SSN → PHONE → IP order — so the redacted text is
byte-identical across engines.

Scale shape: a pure stateless ``map_batches`` over Arrow — the regex
kernels are pyarrow compute (RE2 in C++, no Python loop), nothing
shuffles, nothing is stateful.  The synthetic gate corpus contains no
digit or ``@`` characters at all, so the oracle row only proves
engine equivalence on clean text; the planted-fixture pytest
(tests/test_pii.py) is the behavioral gate.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# order matters for REDACTION (applied sequentially); counting happens
# on the original text where the classes cannot overlap
PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
)


def scrub_batch(b: pa.Table) -> pa.Table:
    text = b.column("text")
    cols = {"doc_id": b.column("doc_id")}
    for name, pat, _ in PATTERNS:
        cols["n_" + name] = pc.count_substring_regex(
            text, pat).cast(pa.int64())
    red = text
    for _, pat, repl in PATTERNS:
        red = pc.replace_substring_regex(red, pat, repl)
    cols["redacted"] = red
    return pa.table(cols)


def pii_scrub(docs):
    """(doc_id, n_email, n_ssn, n_phone, n_ip, redacted) per doc."""
    return docs.map_batches(scrub_batch, batch_format="pyarrow")


def pii_oracle_sql() -> str:
    # patterns pass into DuckDB single-quoted literals verbatim
    # (DuckDB does not treat backslash as an escape there); none may
    # contain a single quote
    counts = ", ".join(
        "len(regexp_extract_all(text, '%s'))::BIGINT AS n_%s"
        % (pat, name) for name, pat, _ in PATTERNS)
    red = "text"
    for _, pat, repl in PATTERNS:
        red = "regexp_replace(%s, '%s', '%s', 'g')" % (red, pat, repl)
    return ("SELECT doc_id, %s, %s AS redacted FROM documents"
            % (counts, red))
