"""PII detection + redaction over a text column — the scrubbing pass a
training-data pipeline runs before anything else sees the corpus.

Three detector classes (email, NANP-style phone, IPv4), applied in a
FIXED order (email -> phone -> ip), each counting its matches and
replacing them with a typed placeholder before the next detector runs.
The order is part of the contract: later patterns scan the already-
redacted text, so e.g. the digits inside an email never double-count
as a phone number. Patterns are RE2-compatible (no backrefs, no
lookaround) so a DuckDB `regexp_replace(..., 'g')` chain replays the
pass exactly — the oracle checks the redacted text byte-for-byte.

Scale shape: embarrassingly parallel map_batches; regexes compile once
per actor in ``__init__``; one ``subn`` per (pattern, row) returns
count + redacted text in a single scan. No shuffle, no state.

Reference analogue: the reference scrubs nothing (it ingests numeric
ids), but this is the standard Common-Crawl -> training-corpus hygiene
stage the north-star pipeline needs at 10^12 documents.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# RE2-compatible; keep in sync with PII_SQL_STEPS below.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# (output count column, pattern, placeholder) — applied in this order.
PII_STEPS = (
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
    ("n_ips", IPV4_RE, "<IP>"),
)


class PIIScrub:
    """(doc_id, text) -> (doc_id, n_emails, n_phones, n_ips, clean_text).

    Stateful actor stage: patterns compile once per actor; ``__call__``
    is one pass per pattern per batch via ``Pattern.subn`` (count +
    replace in a single scan).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # re.ASCII: Python \d matches Unicode digits but RE2 (the DuckDB
        # oracle) is ASCII-only — compile ASCII so both agree byte-for-byte
        self.steps = [
            (col, re.compile(pat, re.ASCII), rep) for col, pat, rep in PII_STEPS
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        counts = {col: np.zeros(n, np.int64) for col, _, _ in self.steps}
        out = []
        for i, t in enumerate(texts):
            for col, pat, rep in self.steps:
                t, k = pat.subn(rep, t)
                counts[col][i] = k
            out.append(t)
        cols: dict = {"doc_id": batch.column("doc_id")}
        for col, _, _ in self.steps:
            cols[col] = pa.array(counts[col])
        cols["clean_text"] = pa.array(out, pa.string())
        return pa.table(cols)


def pii_scrub(docs, text_col: str = "text", batch_size: int = 2048):
    """Scrub a (doc_id, text) Dataset. Pure map — streams at any scale."""
    return docs.map_batches(
        PIIScrub,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


def pii_sql_ctes(src: str, text_expr: str) -> tuple[list[str], str]:
    """DuckDB replay of the exact scrub chain over `src` (which must
    expose doc_id plus whatever columns `text_expr` reads). Returns
    (cte_list, final_select) for the caller to compose into its WITH."""
    prev, ctes = text_expr, []
    count_cols: list[str] = []
    for j, (col, pat, rep) in enumerate(PII_STEPS):
        cur = f"t{j + 1}"
        carried = ", ".join(count_cols)
        carried = carried + ", " if carried else ""
        ctes.append(
            f"p{j} AS (SELECT doc_id, {carried}"
            f"CAST(len(regexp_extract_all({prev}, '{pat}')) AS BIGINT) AS {col}, "
            f"regexp_replace({prev}, '{pat}', '{rep}', 'g') AS {cur} "
            f"FROM {'p%d' % (j - 1) if j else src})"
        )
        count_cols.append(col)
        prev = cur
    last = len(PII_STEPS) - 1
    final = (
        "SELECT doc_id, "
        + ", ".join(count_cols)
        + f", {prev} AS clean_text FROM p{last}"
    )
    return ctes, final
