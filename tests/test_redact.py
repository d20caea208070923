"""PII redaction + duplicate-line repetition stats (training-data scrub ops)."""

import hashlib

import pyarrow as pa
import pytest

from pagerank_barrierfree_openmp_dynamic_ray.functions import redact, textstats


@pytest.fixture(scope="module")
def pii_docs(ray_session):
    import ray.data as rd

    return rd.from_items(
        [
            {"doc_id": 0, "text": "contact alice@example.com or 10.1.2.3 now"},
            # IP-shaped text inside an email's domain counts as the email,
            # not a second IP hit (emails are redacted first)
            {"doc_id": 1, "text": "mail bob@10.0.0.1.hosts.net stays one email"},
            {"doc_id": 2, "text": "no pii here at all"},
            {"doc_id": 3, "text": "two a@b.io c+d_e@f-g.co.uk and 192.168.0.1 8.8.8.8"},
            {"doc_id": 4, "text": ""},
        ]
    )


def test_redactions_counts_and_md5(pii_docs):
    out = redact.redactions(pii_docs).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "n_emails"] == 1 and out.loc[0, "n_ips"] == 1
    assert out.loc[1, "n_emails"] == 1 and out.loc[1, "n_ips"] == 0
    assert out.loc[2, "n_emails"] == 0 and out.loc[2, "n_ips"] == 0
    assert out.loc[3, "n_emails"] == 2 and out.loc[3, "n_ips"] == 2
    expected0 = "contact <EMAIL> or <IP> now"
    assert out.loc[0, "redacted_md5"] == hashlib.md5(expected0.encode()).hexdigest()
    # empty doc: zero matches, md5 of the empty string
    assert out.loc[4, "redacted_md5"] == hashlib.md5(b"").hexdigest()


def test_redact_transform_keeps_schema(pii_docs):
    out = redact.redact(pii_docs).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[0, "text"] == "contact <EMAIL> or <IP> now"
    assert out.loc[3, "text"] == "two <EMAIL> <EMAIL> and <IP> <IP>"
    assert out.loc[2, "text"] == "no pii here at all"


def test_redact_matches_duckdb_re2(pii_docs):
    """The patterns are shared verbatim with the DuckDB twin — pin that the
    two RE2 compilations agree on replacement and count semantics."""
    duckdb = pytest.importorskip("duckdb")

    rows = pii_docs.to_pandas()
    con = duckdb.connect()
    con.register("documents", rows)
    sql = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{redact.EMAIL_RE}'))::BIGINT AS n_emails,
       len(regexp_extract_all(
             regexp_replace(text, '{redact.EMAIL_RE}', '<EMAIL>', 'g'),
             '{redact.IPV4_RE}'))::BIGINT AS n_ips,
       md5(regexp_replace(
             regexp_replace(text, '{redact.EMAIL_RE}', '<EMAIL>', 'g'),
             '{redact.IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM documents ORDER BY doc_id
"""
    want = con.sql(sql).df().set_index("doc_id")
    got = (
        redact.redactions(pii_docs).to_pandas().set_index("doc_id").sort_index()
    )
    for c in ("n_emails", "n_ips", "redacted_md5"):
        assert list(got[c]) == list(want[c]), c


def test_repetition_batch():
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "nav\nnav\nbody text\nnav\n\nfooter",  # 5 nonempty, 3 distinct
                "a\nb\nc",                              # no dups
                "",                                     # no lines at all
                "x\nx",                                 # all dup
            ],
        }
    )
    out = textstats.repetition_batch(t).to_pandas().set_index("doc_id")
    assert list(out["n_lines"]) == [5, 3, 0, 2]
    assert list(out["n_dup_lines"]) == [2, 0, 0, 1]
    assert out.loc[0, "dup_line_frac"] == pytest.approx(2 / 5)
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[3, "dup_line_frac"] == pytest.approx(0.5)


def test_repetitions_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"doc_id": i, "text": "l1\nl2\nl1" if i % 2 else "u\nv"} for i in range(10)]
    )
    out = textstats.repetitions(ds).to_pandas().set_index("doc_id").sort_index()
    assert list(out["n_dup_lines"]) == [0, 1] * 5
