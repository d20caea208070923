"""PII redaction — the scrub pass every web-scale training-data pipeline
runs before tokenization: replace emails and IPv4 literals with typed
placeholder tags and report per-doc match counts.

Fully vectorized: both the replace and the count are single
``pyarrow.compute`` RE2 kernels over the Arrow string column — no Python
loop touches the text.  The patterns are plain-ASCII RE2 shared VERBATIM
with the DuckDB twin (both engines compile RE2, so replacement and count
semantics agree byte-for-byte; see ``__ray_entry__.oracle_sql['doc_redact']``).

Replacement order is part of the definition: emails first, then IPv4 over
the already-email-redacted text (an IP inside an email's domain is counted
as part of the email, not double-redacted) — the twin applies the same
sequence.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# RE2, ASCII classes only — compiled identically by pyarrow and DuckDB.
EMAIL_RE = "[0-9A-Za-z_.+-]+@[0-9A-Za-z-]+(?:\\.[0-9A-Za-z-]+)+"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
EMAIL_TAG = "<EMAIL>"
IPV4_TAG = "<IP>"


def redact_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) -> (doc_id, n_emails, n_ips, redacted_md5).

    ``n_ips`` is counted AFTER email redaction (see module docstring); the
    md5 pins the exact redacted byte content so the oracle compare is on
    the full transform, not just the counts."""
    text = batch["text"]
    n_emails = pc.count_substring_regex(text, pattern=EMAIL_RE)
    step1 = pc.replace_substring_regex(
        text, pattern=EMAIL_RE, replacement=EMAIL_TAG)
    n_ips = pc.count_substring_regex(step1, pattern=IPV4_RE)
    redacted = pc.replace_substring_regex(
        step1, pattern=IPV4_RE, replacement=IPV4_TAG)
    md5s = [hashlib.md5(t.encode()).hexdigest() for t in redacted.to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_ips": pc.cast(n_ips, pa.int64()),
            "redacted_md5": pa.array(md5s),
        }
    )


def redact_text_batch(batch: pa.Table) -> pa.Table:
    """Transform variant: same redaction, returns the redacted text column
    itself (the shape a pipeline feeding a tokenizer consumes)."""
    step1 = pc.replace_substring_regex(
        batch["text"], pattern=EMAIL_RE, replacement=EMAIL_TAG)
    redacted = pc.replace_substring_regex(
        step1, pattern=IPV4_RE, replacement=IPV4_TAG)
    out = batch.drop_columns(["text"])
    return out.append_column("text", redacted)


def redactions(docs):
    """documents Dataset -> per-doc redaction report (stats shape)."""
    return docs.map_batches(redact_batch, batch_format="pyarrow")


def redact(docs):
    """documents Dataset -> same schema with ``text`` redacted in place."""
    return docs.map_batches(redact_text_batch, batch_format="pyarrow")
